package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) is carried as an opaque `binary` column with a
  * typed metadata struct. The Spark-side machinery — schema, partition-local
  * batch iteration (`mapPartitions` in fixed-size batches, the JVM analogue
  * of `mapInPandas` batch shape), and the feature-column contract — is real
  * and tested; the actual codec step is a STUB (this container has no
  * image/audio libraries) implemented as a deterministic fake so the
  * pipeline shape is exercised end to end.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Fabricate a media table from the documents table: the text bytes stand
    * in for encoded media content (deterministic; no external files needed).
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      map(lit("source"), col("source"), lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** STUB decode: a real implementation would decode the codec here (JPEG /
    * PCM / container demux) inside `decodeBatch`. The deterministic fake
    * derives "features" from the raw bytes so results are reproducible and
    * the distributed plumbing (partitioning, batch shape, schema) is real.
    */
  private def fakeDecodeFeatures(bytes: Array[Byte], dims: Int): Array[Double] = {
    // ??? <- real codec goes here; deterministic stand-in below
    val out = new Array[Double](dims)
    var h = 1125899906842597L // FNV-ish rolling hash over content bytes
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var d = 0
    while (d < dims) {
      val v = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
      out(d) = math.abs(v % 1000L).toDouble / 1000.0
      d += 1
    }
    out
  }

  /** Decode + feature-extract over the media table. Runs partition-local in
    * fixed-size batches (batch shape mirrors Arrow-batch UDF execution: the
    * codec amortizes init per batch, not per row). Output: doc_id, kind,
    * n_bytes, 4 feature columns.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("kind", StringType),
      StructField("n_bytes", IntegerType),
      StructField("f0", DoubleType), StructField("f1", DoubleType),
      StructField("f2", DoubleType), StructField("f3", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("doc_id"), col("kind"), col("content"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch init of the (stub) codec happens here
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]]("content")
            val f = fakeDecodeFeatures(bytes, 4)
            Row(r.getLong(0), r.getString(1), bytes.length, f(0), f(1), f(2), f(3))
          }
        }
      }(enc)
      .toDF()
  }

  /** Frame sampling for video-kind rows: 1 synthetic frame per 256 content
    * bytes (a real implementation demuxes at the container level). The
    * explode keeps frame extraction distributed and row-parallel.
    */
  def sampleFrames(media: DataFrame, everyNBytes: Int = 256): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_no",
        explode(sequence(lit(0), greatest(ceil(length(col("content")) / everyNBytes) - 1, lit(0)))))
      .select(col("doc_id"), col("frame_no"),
        substring(col("content"), (col("frame_no") * everyNBytes + 1).cast("int"), lit(everyNBytes)).as("frame_bytes"))
}
