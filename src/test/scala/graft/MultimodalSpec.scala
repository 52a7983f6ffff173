package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media table carries binary content + typed metadata") {
    val m = Multimodal.mediaTable(table("documents"))
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.filter(col("content").isNull).count() == 0)
    assert(m.select("kind").distinct().count() == 3)
  }

  test("containers are REAL: JDK codecs decode them (round trip vs generation rule)") {
    // image: ImageIO parses the BMP and gives back exactly the generated grays
    val px = Multimodal.decodeImage(Multimodal.encodeBmp(42L, 0))
    assert(px.length == Multimodal.ImgH && px.head.length == Multimodal.ImgW)
    for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW)
      assert(px(y)(x) == Multimodal.gray(42L, 0, x, y), s"pixel ($x,$y) mismatch")
    // audio: AudioSystem parses the WAV header + unsigned PCM samples
    val (rate, samples, enc) = Multimodal.decodeAudio(Multimodal.encodeWav(43L))
    assert(rate == Multimodal.WavRate.toFloat && enc == "pcm8")
    assert(samples.length == Multimodal.WavSamples)
    assert(samples.zipWithIndex.forall { case (v, i) => v == Multimodal.sample(43L, i) })
    // video: demux + per-frame ImageIO decode
    val frames = Multimodal.decodeVideo(Multimodal.encodeVideo(44L))
    assert(frames.length == Multimodal.VideoFrames)
    assert(frames(2)(1)(3) == Multimodal.gray(44L, 2, 3, 1))
  }

  test("mu-law: AudioSystem expansion equals the G.711 closed form exactly") {
    // every one of the 256 codes round-trips through the real decompressor
    // to the formula value — the property the SQL oracle relies on
    val (rate, decoded, enc) = Multimodal.decodeAudio(Multimodal.encodeUlawWav(46L))
    assert(rate == Multimodal.WavRate.toFloat && enc == "ulaw")
    assert(decoded.length == Multimodal.WavSamples)
    decoded.zipWithIndex.foreach { case (v, i) =>
      val want = Multimodal.ulawDecode(Multimodal.ulawEncode(Multimodal.pcm16(46L, i)))
      assert(v == want, s"sample $i: AudioSystem=$v formula=$want")
    }
    // companding is lossy but bounded: one quantization step of the band
    decoded.zipWithIndex.foreach { case (v, i) =>
      assert(math.abs(v - Multimodal.pcm16(46L, i)) <= 1024)
    }
    assert(Multimodal.encodeUlawWav(46L).length == 302) // oracle-pinned size
  }

  test("PNG: stored-deflate container decodes via ImageIO to the exact pixels") {
    val bytes = Multimodal.encodePng(42L, 0)
    // closed-form length — the property the mm_features oracle pins
    assert(bytes.length == 140, s"8x8 gray stored-deflate PNG must be 140B, got ${bytes.length}")
    assert(new Multimodal.ImageDecoder().formatOf(bytes) == "png")
    val px = Multimodal.decodeImage(bytes)
    assert(px.length == Multimodal.ImgH && px.head.length == Multimodal.ImgW)
    for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW)
      assert(px(y)(x) == Multimodal.gray(42L, 0, x, y), s"PNG pixel ($x,$y) mismatch")
  }

  test("JPEG: magic-byte routing decodes a real ImageIO-encoded JPEG (lossy-tolerant)") {
    // encode the generated grays as a genuine JPEG via ImageIO's writer
    val img = new java.awt.image.BufferedImage(
      Multimodal.ImgW, Multimodal.ImgH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // write raw raster samples — setRGB would apply an sRGB→gray color-space
    // conversion and store different values than the generation rule
    for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW)
      img.getRaster.setSample(x, y, 0, Multimodal.gray(45L, 0, x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val bytes = out.toByteArray
    val dec = new Multimodal.ImageDecoder()
    assert(dec.formatOf(bytes) == "jpeg")
    val px = dec.decode(bytes)
    // dims survive exactly; pixel values survive within JPEG's lossy budget
    assert(px.length == Multimodal.ImgH && px.head.length == Multimodal.ImgW)
    val diffs = for (y <- 0 until Multimodal.ImgH; x <- 0 until Multimodal.ImgW)
      yield math.abs(px(y)(x) - Multimodal.gray(45L, 0, x, y))
    assert(diffs.sum.toDouble / diffs.size < 32.0,
      s"JPEG decode drifted too far: mean abs diff ${diffs.sum.toDouble / diffs.size}")
    // one decoder instance serves all three formats in one batch
    assert(dec.decode(Multimodal.encodeBmp(45L, 0))(2)(3) == Multimodal.gray(45L, 0, 3, 2))
    assert(dec.decode(Multimodal.encodePng(45L, 0))(2)(3) == Multimodal.gray(45L, 0, 3, 2))
  }

  test("feature extraction decodes for real, deterministic and batch-shaped") {
    val m = Multimodal.mediaTable(table("documents"))
    val f1 = Multimodal.extractFeatures(m).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(m, batchSize = 7).orderBy("doc_id").collect()
    assert(f1.sameElements(f2)) // batch size must not change results
    // image/audio dims come from the decoded containers; image rows are a
    // MIXED column (BMP 246 bytes / stored-deflate PNG 140 bytes) and both
    // routes decode to the same dims
    assert(f1.filter(_.getString(1) == "image").forall(r =>
      r.getDouble(3) == 8.0 && r.getDouble(4) == 8.0 &&
        r.getInt(2) == (if (r.getLong(0) % 6 == 0) 246 else 140)))
    // audio rows are a mixed column too: linear PCM (300B) / mu-law (302B)
    assert(f1.filter(_.getString(1) == "audio").forall(r =>
      r.getDouble(3) == 8000.0 && r.getDouble(4) == 256.0 &&
        r.getInt(2) == (if (r.getLong(0) % 6 == 1) 300 else 302)))
    assert(f1.filter(_.getString(1) == "video").forall(r =>
      r.getDouble(3) == 4.0 && r.getInt(2) == 1008))
    // normalized means/maxima live in [-1, 1] (mu-law means are SIGNED and
    // can dip below zero); maxima stay positive everywhere
    assert(f1.forall(r => r.getDouble(5) >= -1.0 && r.getDouble(5) <= 1.0 &&
      r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0))
  }

  test("audioVad: decoded-sample energies match the generation-rule replay, both codecs") {
    val m = Multimodal.mediaTable(table("documents"))
    val out = Multimodal.audioVad(m).orderBy("doc_id").collect()
    val out2 = Multimodal.audioVad(m, batchSize = 7).orderBy("doc_id").collect()
    assert(out.sameElements(out2)) // batch size must not change results
    assert(out.nonEmpty && out.forall(_.getLong(0) % 3 == 1)) // audio rows only
    // replay from the closed-form generators: PCM8 widens, mu-law compands
    def expected(id: Long): (Int, Int, Int, Double) = {
      val centered = Array.tabulate(Multimodal.WavSamples) { i =>
        val pcm = Multimodal.pcm16(id, i)
        if (id % 6 == 1) pcm.toLong
        else Multimodal.ulawDecode(Multimodal.ulawEncode(pcm)).toLong
      }
      val en = centered.grouped(32).map(f => f.map(v => v * v).sum).toArray
      val theta = en.sum / en.length
      val act = en.map(_ > theta)
      val nAct = act.count(identity)
      val nSeg = act.zipWithIndex.count { case (a, i) => a && (i == 0 || !act(i - 1)) }
      (en.length, nAct, nSeg,
        math.round(nAct.toDouble / en.length * 10000).toDouble / 10000)
    }
    out.foreach { r =>
      val e = expected(r.getLong(0))
      assert((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)) == e,
        s"doc ${r.getLong(0)}: got $r, expected $e")
    }
    // sanity: a segment needs at least one active frame, ratios in [0,1]
    out.foreach { r =>
      assert(r.getInt(3) <= r.getInt(2) && r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("resize: decode -> nearest-neighbor resample -> re-encoded BMP round-trips") {
    val m = Multimodal.mediaTable(table("documents"))
    val resized = Multimodal.resizeImages(m, 4, 4)
    val one = resized.orderBy("doc_id").limit(1).collect().head
    val docId = one.getLong(0)
    assert(one.getInt(1) == 4 && one.getInt(2) == 4)
    // the emitted container is a REAL 4x4 BMP whose pixels are the
    // nearest-neighbor samples of the source image
    val px = Multimodal.decodeImage(one.getAs[Array[Byte]]("content"))
    assert(px.length == 4 && px.head.length == 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(px(y)(x) == Multimodal.gray(docId, 0, x * 2, y * 2), s"resampled pixel ($x,$y)")
  }

  test("resampleAudio: decimated WAV round-trips, both codecs requantize to PCM8") {
    val m = Multimodal.mediaTable(table("documents"))
    val out = Multimodal.resampleAudio(m, factor = 4).orderBy("doc_id").collect()
    assert(out.nonEmpty && out.forall(r =>
      r.getInt(1) == 2000 && r.getInt(2) == 64 &&
        r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
    // batch size must not change results (binary compared by content)
    val out2 = Multimodal.resampleAudio(m, factor = 4, batchSize = 7)
      .orderBy("doc_id").collect()
    out.zip(out2).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getDouble(4) == b.getDouble(4))
      assert(java.util.Arrays.equals(a.getAs[Array[Byte]]("content"),
        b.getAs[Array[Byte]]("content")))
    }
    // pcm8 row: the emitted container is a REAL WAV whose samples are the
    // every-4th decimation of the source
    val p = out.find(_.getLong(0) % 6 == 1).get
    val (rate, ps, pe) = Multimodal.decodeAudio(p.getAs[Array[Byte]]("content"))
    assert(rate == 2000f && pe == "pcm8" && ps.length == 64)
    assert(ps.zipWithIndex.forall { case (v, j) =>
      v == Multimodal.sample(p.getLong(0), j * 4) })
    // mu-law row: decoded samples equal closed-form companding then the
    // arithmetic-shift requantize to unsigned 8-bit
    val u = out.find(_.getLong(0) % 6 == 4).get
    val (_, us, ue) = Multimodal.decodeAudio(u.getAs[Array[Byte]]("content"))
    assert(ue == "pcm8" && us.length == 64)
    assert(us.zipWithIndex.forall { case (v, j) =>
      v == ((Multimodal.ulawDecode(Multimodal.ulawEncode(
        Multimodal.pcm16(u.getLong(0), j * 4))) >> 8) + 128) })
  }

  test("aHash: exact-integer bits, perturbed copies land within hamming 2 and are found") {
    val media = Multimodal.mediaTable(table("documents"))
    val hashes = Multimodal.imageHashes(media)
    // hand-replay one hash from the generation rule
    val h0 = hashes.filter(col("doc_id") === 0).head()
    val px = (0 until 64).map(i => Multimodal.gray(0L, 0, i % 8, i / 8))
    val tot = px.sum
    var hi = 0L; var lo = 0L
    px.zipWithIndex.foreach { case (v, i) =>
      if (v.toLong * 64 >= tot) { if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32) } }
    assert(h0.getLong(1) == hi && h0.getLong(2) == lo)
    // each perturbed copy sits within hamming 2 of its source, and the
    // banded pair join finds every (source, copy) pair
    val all = media.unionByName(Multimodal.perturbedCopies(media))
    val pairs = Multimodal.imageDupPairs(Multimodal.imageHashes(all), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val srcs = media.filter(col("kind") === "image" && col("doc_id") % 30 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(srcs.nonEmpty)
    srcs.foreach { s =>
      val h = pairs.get((s, s + 1000000L))
      assert(h.isDefined && h.get <= 2, s"copy of $s missing or far: $h")
    }
  }

  test("frame sampling yields decodable frames for video rows only") {
    val m = Multimodal.mediaTable(table("documents"))
    val frames = Multimodal.sampleFrames(m)
    val videoIds = m.filter(col("kind") === "video").select("doc_id").distinct().count()
    assert(frames.select("doc_id").distinct().count() == videoIds)
    assert(frames.filter(col("frame_bytes").isNull).count() == 0)
    // a sampled frame is itself a decodable BMP matching its generation rule
    val one = frames.filter(col("frame_no") === 2).limit(1).collect().head
    val docId = one.getLong(0)
    val px = Multimodal.decodeImage(one.getAs[Array[Byte]]("frame_bytes"))
    assert(px(5)(6) == Multimodal.gray(docId, 2, 6, 5))
  }

  test("sceneCuts: constant-shift frames read hamming 0, a wrap splice cuts") {
    import spark.implicits._
    // aHash is mean-relative, so frames whose pixels differ by a constant
    // (no mod-256 wrap: base + 140 < 256) hash identically — hamming 0;
    // splicing a frame whose base wraps (56·31 ≡ 200) flips 56 of 64 bits
    val frames = Seq(
      (1L, 0, Multimodal.encodeBmp(0, 0)),
      (1L, 1, Multimodal.encodeBmp(0, 1)),
      (1L, 2, Multimodal.encodeBmp(56, 0))
    ).toDF("doc_id", "frame_no", "frame_bytes")
    val out = Multimodal.sceneCuts(frames, threshold = 16)
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getBoolean(3))).toMap
    assert(out == Map(1 -> ((0, false)), 2 -> ((56, true))), s"got $out")
  }

  test("shotSummary: per-video cut counts and exact mean hamming") {
    import spark.implicits._
    val cuts = Seq((1L, 1, 5, false), (1L, 2, 20, true), (2L, 1, 0, false))
      .toDF("doc_id", "frame_no", "hamming", "is_cut")
    val out = Multimodal.shotSummary(cuts).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(1L -> ((2L, 1L, 12.5)), 2L -> ((1L, 0L, 0.0))), s"got $out")
  }
}
