package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayInputStream

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) is carried as an opaque `binary` column with a
  * typed metadata struct. Decode is REAL: images are genuine BMP containers
  * parsed by `javax.imageio.ImageIO`, audio is genuine WAV (PCM) parsed by
  * `javax.sound.sampled.AudioSystem`, video is a length-prefixed frame
  * container demuxed and frame-decoded through ImageIO. The media bytes are
  * synthesized deterministically from `doc_id` (no external files in this
  * environment), so every decoded feature is reproducible by the SQL oracle
  * from the generation rule — a wrong header offset, row padding or sample
  * width in the decode path breaks the oracle match.
  *
  * Batch shape mirrors Arrow-batch UDF execution (`mapInPandas`): decoding
  * runs partition-local in fixed-size batches so codec init is amortized per
  * batch, not per row.
  */
object Multimodal {

  val ImgW = 8
  val ImgH = 8
  val WavSamples = 256
  val WavRate = 8000
  val VideoFrames = 4

  // ---------------------------------------------------------------------
  // deterministic synthesis (REAL containers)
  // ---------------------------------------------------------------------

  /** gray value of pixel (x, y) of frame `f` for document `docId` */
  def gray(docId: Long, f: Int, x: Int, y: Int): Int =
    (((docId * 31 + f * 17 + x * 7 + y * 13) % 256).toInt + 256) % 256

  /** unsigned 8-bit PCM sample i for document `docId` */
  def sample(docId: Long, i: Int): Int = (((docId * 7 + i * 3) % 256).toInt + 256) % 256

  /** A real 8x8 24-bit BMP: 54-byte BITMAPINFOHEADER container, BGR rows
    * padded to 4 bytes, stored bottom-up — exactly what ImageIO's BMP
    * reader expects.
    */
  def encodeBmp(docId: Long, frame: Int): Array[Byte] = {
    val rowBytes = ((ImgW * 3 + 3) / 4) * 4 // padded
    val dataSize = rowBytes * ImgH
    val size = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(ImgW).putInt(ImgH).putShort(1).putShort(24)
    b.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = ImgH - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < ImgW) {
        val v = gray(docId, frame, x, y).toByte
        b.put(v).put(v).put(v)
        x += 1
      }
      var pad = ImgW * 3
      while (pad < rowBytes) { b.put(0.toByte); pad += 1 }
      y -= 1
    }
    b.array()
  }

  /** A real 44-byte-header WAV, 8-bit unsigned mono PCM at 8 kHz. */
  def encodeWav(docId: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + WavSamples).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(36 + WavSamples).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    b.putInt(WavRate).putInt(WavRate).putShort(1).putShort(8)
    b.put("data".getBytes).putInt(WavSamples)
    var i = 0
    while (i < WavSamples) { b.put(sample(docId, i).toByte); i += 1 }
    b.array()
  }

  /** Frame container: "GRFV" magic, int32 frame count, then length-prefixed
    * BMP frames (a minimal demuxable video stand-in).
    */
  def encodeVideo(docId: Long): Array[Byte] = {
    val frames = (0 until VideoFrames).map(f => encodeBmp(docId, f))
    val b = java.nio.ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GRFV".getBytes).putInt(VideoFrames)
    frames.foreach { fr => b.putInt(fr.length); b.put(fr) }
    b.array()
  }

  // ---------------------------------------------------------------------
  // REAL decode
  // ---------------------------------------------------------------------

  /** A reusable ImageIO BMP decoder: plugin lookup happens once per instance
    * (per partition/batch), input streams stay in memory (no ImageIO temp
    * files) — per-call `ImageIO.read` costs ~2 ms in plugin scan + file-cache
    * setup, which dominated the decode path at scale.
    */
  final class BmpDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    private val reader = javax.imageio.ImageIO.getImageReadersByFormatName("bmp").next()

    def decode(bytes: Array[Byte]): Array[Array[Int]] = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        Array.tabulate(img.getHeight, img.getWidth)((y, x) => img.getRGB(x, y) & 0xFF)
      } finally iis.close()
    }
  }

  /** decode a BMP through ImageIO and return the gray matrix (top-down) */
  def decodeImage(bytes: Array[Byte]): Array[Array[Int]] = new BmpDecoder().decode(bytes)

  /** decode a WAV through AudioSystem and return (sampleRate, samples 0..255) */
  def decodeAudio(bytes: Array[Byte]): (Float, Array[Int]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    val data = in.readAllBytes()
    (fmt.getSampleRate, data.map(_ & 0xFF))
  }

  /** demux the frame container and ImageIO-decode every frame */
  def decodeVideo(bytes: Array[Byte]): Seq[Array[Array[Int]]] =
    decodeVideoWith(bytes, new BmpDecoder())

  private def decodeVideoWith(bytes: Array[Byte], dec: BmpDecoder): Seq[Array[Array[Int]]] = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); b.get(magic)
    require(new String(magic) == "GRFV", "bad video container magic")
    val n = b.getInt
    (0 until n).map { _ =>
      val len = b.getInt
      val fr = new Array[Byte](len); b.get(fr)
      dec.decode(fr)
    }
  }

  // ---------------------------------------------------------------------
  // Spark plumbing
  // ---------------------------------------------------------------------

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Build a media table from the documents table: kind rotates by doc_id,
    * content is a genuinely-encoded container (BMP / WAV / frame container),
    * synthesized deterministically per row, distributed (partition-local).
    */
  def mediaTable(documents: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    documents.select(col("doc_id"), col("source"), col("n_chars"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val (kind, bytes) = (id % 3) match {
            case 0 => ("image", encodeBmp(id, 0))
            case 1 => ("audio", encodeWav(id))
            case _ => ("video", encodeVideo(id))
          }
          Row(id, kind, bytes, Map("source" -> r.getString(1), "n_chars" -> r.get(2).toString))
        }
      }(enc)
      .toDF()
  }

  /** Decode + feature-extract over the media table — partition-local in
    * fixed-size batches. Features (all derived from DECODED pixels/samples,
    * never from doc_id):
    *  image: f0=width, f1=height, f2=mean gray/255, f3=max gray/255
    *  audio: f0=sample rate, f1=sample count, f2=mean/255, f3=max/255
    *  video: f0=frame count, f1=frame width, f2=mean gray of frame 0/255,
    *         f3=mean of per-frame means/255
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("kind", StringType),
      StructField("n_bytes", IntegerType),
      StructField("f0", DoubleType), StructField("f1", DoubleType),
      StructField("f2", DoubleType), StructField("f3", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col("doc_id"), col("kind"), col("content"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // codec init amortizes per batch: ONE ImageIO reader instance
          // serves the whole batch (plugin lookup + stream setup per call is
          // what makes naive per-row ImageIO.read ~50x slower)
          val dec = new BmpDecoder()
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val kind = r.getString(1)
            val bytes = r.getAs[Array[Byte]]("content")
            val (f0, f1, f2, f3) = kind match {
              case "image" =>
                val px = dec.decode(bytes)
                val flat = px.flatten
                (px.head.length.toDouble, px.length.toDouble,
                  flat.sum.toDouble / flat.length / 255.0,
                  flat.max.toDouble / 255.0)
              case "audio" =>
                val (rate, samples) = decodeAudio(bytes)
                (rate.toDouble, samples.length.toDouble,
                  samples.sum.toDouble / samples.length / 255.0,
                  samples.max.toDouble / 255.0)
              case _ =>
                val frames = decodeVideoWith(bytes, dec)
                val means = frames.map(px => { val f = px.flatten; f.sum.toDouble / f.length / 255.0 })
                (frames.length.toDouble, frames.head.head.length.toDouble,
                  means.head, means.sum / means.length)
            }
            Row(id, kind, bytes.length, f0, f1, f2, f3)
          }
        }
      }(enc)
      .toDF()
  }

  /** Encode a gray matrix (top-down) back into a real BMP container. */
  def encodeBmpFromPixels(px: Array[Array[Int]]): Array[Byte] = {
    val h = px.length
    val w = px.head.length
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataSize = rowBytes * h
    val size = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) { val v = px(y)(x).toByte; b.put(v).put(v).put(v); x += 1 }
      var pad = w * 3
      while (pad < rowBytes) { b.put(0.toByte); pad += 1 }
      y -= 1
    }
    b.array()
  }

  /** Resize image-kind rows: REAL decode → nearest-neighbor resample →
    * re-encode as a real BMP. Partition-local in batches with one pooled
    * decoder (same shape as extractFeatures); output carries the resized
    * container plus decoded-side stats so the transformation is checkable
    * end to end.
    */
  def resizeImages(media: DataFrame, outW: Int, outH: Int, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("content", BinaryType),
      StructField("mean_gray", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("content"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val dec = new BmpDecoder()
          batch.iterator.map { r =>
            val src = dec.decode(r.getAs[Array[Byte]]("content"))
            val (srcH, srcW) = (src.length, src.head.length)
            val resized = Array.tabulate(outH, outW)((y, x) =>
              src(y * srcH / outH)(x * srcW / outW)) // nearest neighbor
            val flat = resized.flatten
            Row(r.getLong(0), outW, outH, encodeBmpFromPixels(resized),
              flat.sum.toDouble / flat.length / 255.0)
          }
        }
      }(enc)
      .toDF()
  }

  /** Frame sampling for video-kind rows: demux offsets of the length-prefixed
    * container are fixed (constant frame size), so frame extraction stays a
    * columnar substring — distributed and row-parallel, no decode needed for
    * the sampling step itself.
    */
  def sampleFrames(media: DataFrame): DataFrame = {
    val frameLen = 54 + ((ImgW * 3 + 3) / 4) * 4 * ImgH
    media.filter(col("kind") === "video")
      .withColumn("frame_no", explode(sequence(lit(0), lit(VideoFrames - 1))))
      .select(col("doc_id"), col("frame_no"),
        substring(col("content"),
          (lit(8 + 4) + col("frame_no") * (frameLen + 4) + 1).cast("int"),
          lit(frameLen)).as("frame_bytes"))
  }
}
