package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sink-side write strategies.
  *
  * Reference: the bulk-loading machinery (`_BaseBulkloadable`,
  * pygrametl/tables.py:2508-2683) spools rows to a delimited temp file with
  * `fieldsep`/`rowsep`/`nullsubst` and hands it to a DBMS bulk loader;
  * `SubprocessFactTable` (tables.py:3222-3319) pipes delimited rows into an
  * external process. In Spark these collapse into `DataFrameWriter` formats
  * (vectorized, parallel) and `foreachPartition` for arbitrary external
  * sinks. The `dependson` flush ordering lives in `EtlSession.commit`.
  */
object Writers {

  /** Bulk-load-shaped CSV export: explicit field separator and NULL
    * substitute (the reference bulkloader contract's knobs).
    */
  def bulkCsv(df: DataFrame, path: String, fieldSep: String = "\t",
              nullSubst: String = "\\N"): Unit =
    df.write.mode("overwrite")
      .option("delimiter", fieldSep)
      .option("nullValue", nullSubst)
      .option("emptyValue", "")
      .csv(path)

  /** Parquet write partitioned by columns (the warehouse-native bulk load). */
  def partitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed catalog table: rows hash-bucketed (and sorted) by the join
    * keys at write time, so later equi joins/aggregations on those keys read
    * co-located buckets and skip the shuffle entirely — the persistent form
    * of `repartition` pre-shuffling, and the standard answer for big
    * fact-to-fact joins repeated across runs (pay the shuffle once at load,
    * never at query). Dimensional loads: bucket facts and large dims by the
    * surrogate key.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** SubprocessFactTable equivalent: stream each partition's rows to an
    * arbitrary external consumer (e.g. a process stdin, a socket, a native
    * loader). Runs on executors — the distributed form of the reference's
    * single pipe.
    */
  def foreachPartitionSink(df: DataFrame)(consume: Iterator[Row] => Unit): Unit =
    df.foreachPartition(consume)

  /** Delimited-line rendering of rows (fieldsep/nullsubst semantics of
    * `_BaseBulkloadable.insert`, tables.py:2593-2619) as a DataFrame of
    * strings — feed to foreachPartitionSink or text write.
    */
  def delimited(df: DataFrame, fieldSep: String = "\t", nullSubst: String = "\\N"): DataFrame =
    df.select(concat_ws(fieldSep,
      df.columns.map(c => coalesce(col(c).cast("string"), lit(nullSubst))): _*).as("line"))
}
