package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-data serving: lay documents end-to-end
  * into fixed `ctxLen`-token context windows (the concat-and-chunk scheme),
  * assigning every document a deterministic (shard, pack, offset) address.
  *
  * Documents are first routed to one of `shards` streams by an md5 hash
  * bucket of their id (deterministic across runs/engines/scales — same
  * scheme as [[Sampling.hashBucket]]), then packed greedily in id order
  * within each shard via a running token total: a document starts at the
  * global offset `start = cumsum(tokens) - tokens` of its shard, lands in
  * pack `start div ctxLen` at offset `start mod ctxLen`, and spills into the
  * following pack when it crosses the boundary — no padding between docs.
  *
  * 100 TB notes: the only shuffle is the per-shard window (hash-partitioned
  * on the shard key, sorted by id within partitions — never a global sort).
  * Shard count bounds per-task state; raise it with data volume so each
  * shard's window stays executor-sized. Packing is reproducible: adding
  * documents with higher ids never moves earlier ones.
  */
object Packing {

  /** (idCol, shard, n_tok, pack, off) for every row of `df` */
  def packPlan(df: DataFrame, idCol: String, tokCol: Column, shards: Int = 32,
               ctxLen: Int = 512, salt: String = "pack"): DataFrame = {
    require(shards > 0 && ctxLen > 0, "shards and ctxLen must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), Sampling.hashBucket(col(idCol), shards, salt).as("shard"),
        tokCol.cast("long").as("n_tok"))
      .withColumn("__start", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col(idCol), col("shard"), col("n_tok"),
        expr(s"__start div $ctxLen").as("pack"),
        pmod(col("__start"), lit(ctxLen.toLong)).as("off"))
  }

  /** Padding-waste audit for candidate context lengths — the dataloader
    * planning table run before choosing a training seqLen: for each
    * candidate, what fraction of compute would be padding under naive
    * one-doc-per-row batching (docs truncated at the context length, the
    * remainder of the last window padded) vs the zero-padding dense
    * [[packPlan]]. The gap IS the argument for sequence packing, quantified
    * on the actual corpus.
    *
    * Scale shape: ONE map-side-combined aggregation per candidate over the
    * scan-speed token count, unioned into a |candidates|-row table —
    * corpus touched once per candidate with no shuffle beyond the
    * single-row aggregations. Exact long arithmetic; ratios decimal-staged.
    *
    * Returns (ctx_len, n_docs, total_tokens, padded_tokens, pad_frac)
    * ordered by ctx_len, where padded_tokens counts naive per-doc padding
    * `ceil(min(tok,ctx)/ctx)·ctx − min(tok,ctx)` summed (zero-token docs
    * contribute zero).
    */
  def paddingAudit(df: DataFrame, tokCol: Column,
                   ctxLens: Seq[Int]): DataFrame = {
    require(ctxLens.nonEmpty && ctxLens.forall(_ > 0), "ctxLens must be positive")
    val toks = df.select(tokCol.cast("long").as("__t"))
    ctxLens.map { ctx =>
      val kept = when(col("__t") <= 0, lit(0L))
        .otherwise(least(col("__t"), lit(ctx.toLong)))
      val pad = when(col("__t") <= 0, lit(0L))
        .otherwise(lit(ctx.toLong) - least(col("__t"), lit(ctx.toLong)))
      toks.agg(count(lit(1)).as("n_docs"),
          sum(col("__t")).as("total_tokens"),
          sum(kept).as("__kept"),
          sum(pad).as("padded_tokens"))
        .select(lit(ctx).as("ctx_len"), col("n_docs"), col("total_tokens"),
          col("padded_tokens"),
          // denominator = naive compute = kept + padded (= nonempty·ctx)
          round((col("padded_tokens").cast("double") /
              greatest(col("__kept") + col("padded_tokens"), lit(1L)))
            .cast(org.apache.spark.sql.types.DecimalType(18, 8)), 6)
            .cast("double").as("pad_frac"))
    }.reduce(_.unionAll(_))
  }

  /** Length-bucketed inference batching — the serving-side twin of
    * [[packPlan]]: training packs documents end-to-end, but
    * inference/scoring runs fixed-size batches whose compute is
    * `batchSize × max-length-in-batch` — batching a 10-token doc with a
    * 500-token doc wastes 98% of the short row's compute as padding.
    * Documents are bucketed by token-length bin (`width` tokens), dealt
    * deterministically (md5 order) into `batchSize`-row batches WITHIN a
    * bin, so batch peers differ by at most `width` tokens and padding is
    * bounded by `batchSize·width` per batch.
    *
    * Scale shape: binning is scan-speed; batch ordinals come from a
    * (bin, shard)-keyed ranking window — `shards` md5 sub-shards bound
    * per-partition state (a whale bin of uniform-length documents would
    * otherwise sort in one task; raise `shards` with corpus size, the
    * [[packPlan]] discipline). Assignment is deterministic across
    * runs/engines: the order inside a bin is the md5 of the id.
    *
    * Returns (idCol, n_tok, bin, shard, batch, pos).
    */
  def lengthBuckets(df: DataFrame, idCol: String, tokCol: Column,
                    width: Int = 16, batchSize: Int = 8, shards: Int = 4,
                    salt: String = "lb"): DataFrame = {
    require(width > 0 && batchSize > 0 && shards > 0,
      "width, batchSize and shards must be positive")
    val base = df.select(col(idCol), tokCol.cast("long").as("n_tok"))
      .withColumn("bin", expr(s"n_tok div $width"))
      .withColumn("shard", Sampling.hashBucket(col(idCol), shards, salt))
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit(salt))))
    val w = Window.partitionBy(col("bin"), col("shard"))
      .orderBy(col("__h"), col(idCol))
    base.withColumn("__rn", row_number().over(w) - 1)
      .select(col(idCol), col("n_tok"), col("bin"), col("shard"),
        expr(s"__rn div $batchSize").as("batch"),
        (col("__rn") % batchSize).as("pos"))
  }

  /** Per-batch padding report over a [[lengthBuckets]] plan: each batch's
    * row count, max/sum token lengths, absolute padding
    * (`n_rows·max − sum`) and padded fraction of the batch's compute —
    * the evidence that length bucketing beats random batching. One
    * map-side-combined aggregation to |batches| rows.
    */
  def lengthBucketStats(plan: DataFrame): DataFrame =
    plan.groupBy(col("bin"), col("shard"), col("batch"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .select(col("bin"), col("shard"), col("batch"), col("n_rows"),
        col("max_tok"), col("sum_tok"),
        (col("n_rows") * col("max_tok") - col("sum_tok")).as("pad_tokens"),
        round(when(col("n_rows") * col("max_tok") === 0, lit(0.0))
          .otherwise((col("n_rows") * col("max_tok") - col("sum_tok")).cast("double")
            / (col("n_rows") * col("max_tok")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 8)), 4)
          .cast("double").as("pad_frac"))

  /** Sliding-window token chunking with overlap — the RAG/long-context prep
    * that complements [[packPlan]]'s dense packing: each document splits
    * into `window`-token chunks every `stride` tokens (overlap =
    * window−stride), the LAST start clamping to `n−window` so the final
    * chunk is always full-width and ends exactly at the document boundary
    * (no sub-stride tail fragments). Documents of ≤ `window` tokens emit
    * one chunk; zero-token documents emit none.
    *
    * Pure per-row expressions (sequence → explode → slice) — no shuffle at
    * all, scan-speed over 100 TB; chunk addressing is (id, chunk, start)
    * and the md5 fingerprint of the chunk's tokens makes each chunk
    * directly usable by the exact-dedup / embedding stages downstream.
    *
    * Returns (idCol, chunk, start, n_tok, fp).
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val chunks = floor((greatest(col("__n") - window, lit(0)).cast("double"))
      / stride).cast("long") +
      when(pmod(greatest(col("__n") - window, lit(0)), lit(stride)) > 0, 2L)
        .otherwise(1L)
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("chunk", explode(sequence(lit(0L), chunks - 1)))
      .withColumn("start",
        least(col("chunk") * stride, greatest(col("__n") - window, lit(0L))))
      .withColumn("__ct", slice(col("__toks"), (col("start") + 1).cast("int"), lit(window)))
      .select(col(idCol), col("chunk"), col("start"),
        size(col("__ct")).cast("long").as("n_tok"),
        md5(concat_ws(" ", col("__ct"))).as("fp"))
  }
}
