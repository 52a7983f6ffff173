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
}
