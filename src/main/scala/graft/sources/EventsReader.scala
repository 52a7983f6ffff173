package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive reader for the `events` table.
  *
  * The testdata has shipped `ts` under two physical encodings: parquet
  * TIMESTAMP(NANOS) (which Spark's parquet reader only surfaces as a long via
  * the `nanosAsLong` legacy flag) and plain TIMESTAMP(MICROS). Mirroring the
  * reference's defensive converters (pygrametl/__init__.py:292-337 —
  * `getdate`/`gettimestamp` accept several encodings and degrade gracefully),
  * this reader branches on the *loaded* dataType instead of hard-coding one
  * encoding: a LongType `ts` is nanos and is integer-divided to micros
  * (matching DuckDB's nanos->micros truncation; integer DIV keeps full
  * precision where a double division would lose bits above 2^53), while a
  * TimestampType `ts` passes through unchanged.
  */
object EventsReader {
  def read(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // NTZ -> LTZ: the session timezone is pinned to UTC everywhere in this
      // library, so the cast is value-identical; downstream expressions
      // (unix_micros, window()) require the TIMESTAMP type.
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
