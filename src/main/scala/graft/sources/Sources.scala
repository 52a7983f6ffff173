package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-source combinators.
  *
  * Reference: pygrametl/datasources.py — 17 iterable row sources. A pygrametl
  * source is "any iterable yielding dicts"; here a source is any DataFrame,
  * and each reference source class becomes either a DataFrameReader recipe or
  * a DataFrame->DataFrame combinator, so the whole chain stays one lazy plan
  * that Catalyst optimizes end to end (pushdown through filter/mapping
  * combinators is free).
  *
  * Process-based sources (`ProcessSource`, `BackgroundSource`,
  * datasources.py:236-291) are deliberately absent: Spark's task parallelism
  * subsumes them (SURVEY §2.10).
  */
object Sources {

  /** CSVSource (reference: datasources.py:72 — csv.DictReader). */
  def csv(spark: SparkSession, path: String, delimiter: String = ","): DataFrame =
    spark.read.option("header", "true").option("delimiter", delimiter).csv(path)

  /** TypedCSVSource (reference: datasources.py:75-132): CSV + per-column
    * casts; cast failure → NULL (the reference's cast-or-default, default
    * handled by Converters downstream).
    */
  def typedCsv(spark: SparkSession, path: String, schema: StructType,
               delimiter: String = ",", header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).option("delimiter", delimiter)
      .option("mode", "PERMISSIVE").schema(schema).csv(path)

  /** SQLSource (reference: datasources.py:135-217): one SQL query as a source
    * with optional column renaming (`names`).
    */
  def sql(spark: SparkSession, query: String, names: Seq[String] = Nil): DataFrame = {
    val df = spark.sql(query)
    if (names.isEmpty) df else df.toDF(names: _*)
  }

  /** DynamicForEachSource (reference: datasources.py:741-781): one sub-source
    * per seed element, concatenated. Spark-first: globs collapse into one
    * multi-file scan; the general case is a unionByName fold.
    */
  def dynamicForEach(seeds: Seq[String], mk: String => DataFrame): DataFrame =
    seeds.map(mk).reduce(_.unionByName(_, allowMissingColumns = true))

  /** FilteringSource (reference: datasources.py:668-686). */
  def filtering(df: DataFrame, cond: Column): DataFrame = df.filter(cond)

  /** MappingSource (reference: datasources.py:404-427): apply {att: fn} to
    * each row's columns — columnar `withColumn`s, codegen'd.
    */
  def mapping(df: DataFrame, fns: Map[String, Column => Column]): DataFrame =
    fns.foldLeft(df) { case (d, (att, fn)) => d.withColumn(att, fn(col(att))) }

  /** TransformingSource (reference: datasources.py:430-448): arbitrary
    * whole-row transforms applied in order.
    */
  def transforming(df: DataFrame, fns: (DataFrame => DataFrame)*): DataFrame =
    fns.foldLeft(df)((d, f) => f(d))

  /** ValueMappingStep (reference: steps.py:207-256): dictionary translation
    * of one attribute into another (e.g. 'DK'→'Denmark') with a default.
    * Small maps inline as a literal map expression (codegen'd, no join);
    * large maps should broadcast-join a lookup DataFrame instead.
    */
  def valueMapping(df: DataFrame, outAtt: String, inAtt: String,
                   mapping: Map[String, String], default: Any = null): DataFrame = {
    val m = typedLit(mapping)
    df.withColumn(outAtt, coalesce(element_at(m, col(inAtt).cast("string")), lit(default)))
  }

  /** UnionSource (reference: datasources.py:689-705): concatenation, schemas
    * may differ → missing columns become NULL.
    */
  def union(dfs: DataFrame*): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** RoundRobinSource (reference: datasources.py:708-738): interleaving
    * batches is an ordering effect with no set semantics — in Spark this is
    * a union followed by a round-robin repartition (the interleaving happens
    * across partitions instead of within an iterator).
    */
  def roundRobin(nParts: Int, dfs: DataFrame*): DataFrame =
    union(dfs: _*).repartition(nParts)

  /** HashJoiningSource (reference: datasources.py:296-332): equi inner join,
    * `src2`'s columns overwrite `src1`'s on name collision. The reference
    * builds an in-memory hash multimap of src2 — the broadcast hash join is
    * the distributed form of exactly that, but only when src2 is actually
    * small (size-gated; an unbounded src2 takes a shuffle join, which the
    * reference's in-memory multimap simply could not do).
    */
  def hashJoining(src1: DataFrame, key1: String, src2: DataFrame, key2: String): DataFrame = {
    val overlap = src2.columns.toSet.intersect(src1.columns.toSet) - key1
    val left = overlap.foldLeft(src1)((d, c) => d.drop(c)) // src2 wins on collision
    val right = graft.core.Joins.maybeBroadcast(src2)
    if (key1 == key2) left.join(right, Seq(key1), "inner")
    else left.join(right, left(key1) === src2(key2), "inner")
  }

  /** MergeJoiningSource (reference: datasources.py:335-401): equi join of two
    * pre-sorted sources. Sortedness is an input contract Spark doesn't need —
    * Catalyst picks sort-merge join for large sides on its own.
    */
  def mergeJoining(src1: DataFrame, src2: DataFrame, on: Seq[String]): DataFrame =
    src1.join(src2, on, "inner")

  /** SQLTransformingSource (reference: datasources.py:451-606): stage rows
    * into a temp table, run an arbitrary SQL query over it. The reference's
    * only declarative entry point — first-class here: temp view + spark.sql.
    */
  def sqlTransforming(df: DataFrame, viewName: String, query: String): DataFrame = {
    df.createOrReplaceTempView(viewName)
    df.sparkSession.sql(query)
  }

  /** SQLTransformingSource per-batch mode (reference: datasources.py:536-606,
    * `perbatch=True` — stage `batchsize` rows into the temp table, run the
    * query, truncate, repeat). The set form replaces arrival-order batches
    * with an explicit `batchCol`: the query runs once per distinct batch
    * value over exactly that batch's rows, and each result carries its batch
    * id in `batchOutCol`. Aggregations therefore aggregate per batch —
    * intentionally different results from the whole-input mode.
    *
    * Scale contract: the distinct batch-id set is collected to drive the
    * per-batch staging (the reference's loop is just as sequential), so the
    * NUMBER of batches must be bounded — rows per batch are unbounded and
    * stay distributed. For unbounded batch counts, express the query with
    * the batch column in its GROUP BY instead.
    */
  def sqlTransformingPerBatch(df: DataFrame, viewName: String, query: String,
                              batchCol: Column, batchOutCol: String = "batch"): DataFrame = {
    val spark = df.sparkSession
    val tagged = df.withColumn("__graft_batch", batchCol)
    val batches = tagged.select(col("__graft_batch")).distinct()
      .orderBy(col("__graft_batch")).collect().map(_.get(0))
    if (batches.isEmpty) {
      df.createOrReplaceTempView(viewName)
      // typed null batch column: keeps the schema identical to the non-empty
      // path (a NullType column breaks parquet writes and unionByName)
      spark.sql(query).limit(0)
        .withColumn(batchOutCol, lit(null).cast(tagged.schema("__graft_batch").dataType))
    } else {
      val batchType = tagged.schema("__graft_batch").dataType
      val parts = batches.map { b =>
        // spark.sql analyzes eagerly, so each plan captures its own batch view;
        // the batch literal is cast to the batch column's type (a NULL batch
        // id would otherwise emit a NullType column)
        tagged.filter(col("__graft_batch") <=> lit(b).cast(batchType)).drop("__graft_batch")
          .createOrReplaceTempView(viewName)
        spark.sql(query).withColumn(batchOutCol, lit(b).cast(batchType))
      }
      parts.reduce(_.unionByName(_))
    }
  }

  /** CrossTabbingSource (reference: datasources.py:609-665): pivot. The
    * reference fully materializes the input in driver memory; Spark's
    * groupBy().pivot() is the distributed equivalent. Pass explicit
    * `colValues` to skip the extra distinct-scan job and keep the plan
    * single-pass (required at 100 TB).
    */
  def crossTab(df: DataFrame, rowAtt: String, colAtt: String, valAtt: String,
               colValues: Seq[String] = Nil, agg: String = "sum",
               fill: Option[Any] = None, sortRows: Boolean = true): DataFrame = {
    val g = df.groupBy(col(rowAtt))
    val p = if (colValues.nonEmpty) g.pivot(colAtt, colValues) else g.pivot(colAtt)
    val out = p.agg(expr(s"$agg($valAtt)"))
    val filled = fill.map(v => out.na.fill(v.toString.toDouble)).getOrElse(out)
    if (sortRows) filled.orderBy(col(rowAtt)) else filled
  }
}
