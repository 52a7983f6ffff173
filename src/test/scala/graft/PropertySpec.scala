package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.tables._

/** Property-based contracts (SURVEY §5): ensure idempotence, key uniqueness,
  * and SCD2 interval invariants over randomized member/change streams.
  * Generators are ScalaCheck `Gen`s sampled with fixed seeds (deterministic
  * CI, no scalatest-plus bridge needed); samples are kept small (a Spark job
  * per case) but cover the degenerate shapes that break set-oriented ETL:
  * duplicate members within a batch, reordered input, all-same and
  * all-distinct keys.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val Cases = 8

  /** deterministically sample `gen` with seed i */
  private def sample[A](gen: Gen[A], i: Int, size: Int = 40): A =
    gen(Gen.Parameters.default.withSize(size), Seed(41L + i)).get

  private def forAllSeeded[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to Cases).foreach(i => body(sample(gen, i)))

  private val memberGen: Gen[List[(String, String)]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(0, 15)
      attr <- Gen.oneOf("a", "b", "c")
    } yield (s"m$id", attr))

  private def freshDim() = {
    val d = new Dimension("pd", "key", Seq("name", "attr"), Seq("name"))
    d.init(Seq.empty[(Long, String, String)].toDF("key", "name", "attr"))
    d
  }

  test("ensure is idempotent and keys stay unique and dense across batches") {
    forAllSeeded(Gen.zip(memberGen, memberGen)) { case (batch1, batch2) =>
      if (batch1.nonEmpty || batch2.nonEmpty) {
        val d = freshDim()
        def load(b: List[(String, String)]): Unit =
          if (b.nonEmpty) { d.ensure(b.toDF("name", "attr")); () }
        load(batch1); load(batch2)
        val before = d.current.orderBy("key").collect().toSeq
        load(batch1) // re-ensure of already-seen members must be a no-op
        val after = d.current.orderBy("key").collect().toSeq
        assert(after == before, "ensure must be idempotent on seen members")
        val keys = after.map(_.getLong(0))
        assert(keys.distinct.size == keys.size, "keys must be unique")
        assert(keys.sorted == (1L to keys.size).toSeq, "default keys are dense from 1")
        val names = (batch1 ++ batch2).map(_._1).distinct.sorted
        assert(after.map(_.getString(1)).sorted == names, "one member per distinct lookupatt")
      }
    }
  }

  /** random token streams over a small vocabulary (forces shared runs) */
  private val docGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf((0 to 9).map(i => s"w$i")))

  test("winnowing guarantee: a shared run of >= window+k-1 tokens shares a fingerprint") {
    // MOSS winnowing theorem: any common substring of at least w+k-1 tokens
    // contains a full hash window, whose minimum both documents select
    val k = 4; val w = 4
    forAllSeeded(Gen.zip(docGen, docGen, Gen.listOfN(w + k - 1, Gen.oneOf((10 to 19).map(i => s"s$i"))))) {
      case (pre, post, sharedRun) =>
        val a = (pre ++ sharedRun).mkString(" ")
        val b = (sharedRun ++ post).mkString(" ")
        val fps = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
          .select(col("doc_id"),
            graft.functions.Dedup.winnowedFingerprints(col("text"), k, w).as("f"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
        assert(fps(1L).intersect(fps(2L)).nonEmpty,
          s"docs sharing a ${w + k - 1}-token run must share a winnowed fingerprint")
    }
  }

  test("hash sampling: nested fractions, stable membership, quota respected") {
    val docs = table("documents")
    forAllSeeded(Gen.zip(Gen.chooseNum(1, 8), Gen.chooseNum(1, 5))) { case (tenths, cap) =>
      val lo = tenths / 10.0
      val hi = math.min(1.0, lo + 0.2)
      val sLo = graft.functions.Sampling.sampleByHash(docs, "doc_id", lo, salt = "p")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val sHi = graft.functions.Sampling.sampleByHash(docs, "doc_id", hi, salt = "p")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sLo.subsetOf(sHi), s"sample($lo) must nest inside sample($hi)")
      val strat = graft.functions.Sampling.stratifiedSample(docs, Seq("source"), "doc_id", cap, "p")
      assert(strat.groupBy("source").count().filter(col("count") > cap).count() == 0,
        s"per-group quota $cap exceeded")
    }
  }

  private val changeGen: Gen[List[(Int, String, Int)]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(0, 5)
      st <- Gen.oneOf("x", "y", "z")
      t <- Gen.chooseNum(1, 1000)
    } yield (id, st, t))

  test("scd2 invariants hold for arbitrary change streams, batched arbitrarily") {
    forAllSeeded(Gen.zip(changeGen, Gen.chooseNum(1, 3))) { case (changes, nBatches) =>
      // distinct (member, time) pairs — equal timestamps for one member have
      // no defined order (matches the engine's input contract)
      val distinctChanges = changes.groupBy(c => (c._1, c._3)).map(_._2.head).toList
      if (distinctChanges.nonEmpty) {
        val dim = new ScdDimension("ps", "key",
          Seq("uid", "status", "version", "vfrom", "vto"), Seq("uid"),
          "version", "vfrom", "vto", maxTo = lit(null).cast(TimestampType))
        dim.init(Seq.empty[(Long, String, String, Int, java.sql.Timestamp, java.sql.Timestamp)]
          .toDF("key", "uid", "status", "version", "vfrom", "vto"))
        // split the stream into time-ordered batches (micro-batch loads)
        val sorted = distinctChanges.sortBy(_._3)
        val per = math.max(1, sorted.size / nBatches)
        sorted.grouped(per).foreach { b =>
          val df = b.map { case (id, st, t) => (s"u$id", st, new java.sql.Timestamp(t * 1000L)) }
            .toDF("uid", "status", "ts")
          dim.scdensure(df, col("ts"))
        }
        val d = dim.current.collect()
        val byMember = d.groupBy(_.getAs[String]("uid"))
        byMember.foreach { case (uid, rows) =>
          val vs = rows.map(_.getAs[Int]("version")).sorted
          assert(vs.toSeq == (1 to vs.length).toSeq, s"$uid versions contiguous")
          assert(rows.count(_.getAs[java.sql.Timestamp]("vto") == null) == 1,
            s"$uid exactly one open version")
          // intervals chain with no overlap: to(v) == from(v+1)
          val sortedRows = rows.sortBy(_.getAs[Int]("version"))
          sortedRows.sliding(2).foreach {
            case Array(a, b) =>
              assert(a.getAs[java.sql.Timestamp]("vto") == b.getAs[java.sql.Timestamp]("vfrom"),
                s"$uid interval chain broken")
            case _ =>
          }
          // consecutive versions must differ in the tracked attribute
          sortedRows.sliding(2).foreach {
            case Array(a, b) =>
              assert(a.getAs[String]("status") != b.getAs[String]("status"),
                s"$uid consecutive versions must differ")
            case _ =>
          }
        }
        val keys = d.map(_.getAs[Long]("key"))
        assert(keys.distinct.length == keys.length, "scd keys unique")
      }
    }
  }

  private val idDocGen: Gen[List[(Long, String)]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(0L, 30L)
      words <- Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2"))
    } yield (id, words.mkString(" "))).map(_.distinctBy(_._1))

  test("cutSpans accounting: kept + cut == tokens, clean text never gains tokens") {
    import graft.functions.{Dedup, TextAnalysis}
    forAllSeeded(idDocGen) { docsList =>
      if (docsList.nonEmpty) {
        val df = docsList.toDF("doc_id", "text")
        val toks = df.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
        val out = Dedup.cutSpans(df, "doc_id", "text", k = 3)
        val joined = out.join(toks, "doc_id").collect()
        assert(joined.length == docsList.length, "every doc appears once")
        joined.foreach { r =>
          val (kept, cut, nt) = (r.getAs[Long]("n_kept"), r.getAs[Long]("n_cut"),
            r.getAs[Long]("nt"))
          assert(kept + cut == nt, s"kept $kept + cut $cut != tokens $nt")
          val cleanToks = r.getAs[String]("clean_text").split(" ").count(_.nonEmpty)
          assert(cleanToks == kept, "clean_text token count must equal n_kept")
        }
      }
    }
  }

  test("star CC equals union-find on arbitrary graphs") {
    import graft.functions.Dedup
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOf(Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 30L)))
    forAllSeeded(edgeGen) { edges =>
      if (edges.nonEmpty) {
        val df = edges.toDF("id_a", "id_b")
        // ground truth: the gated driver-side union-find
        val local = Dedup.connectedComponents(df)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val proper = edges.filter { case (a, b) => a != b }
        if (proper.nonEmpty) {
          val (starLabels, _) = Dedup.starComponents(
            proper.toDF("src", "dst"))
          val star = starLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          // union-find also labels self-loop-only nodes; compare on the
          // star graph's node universe (proper-edge endpoints)
          val nodes = proper.flatMap(e => Seq(e._1, e._2)).toSet
          assert(star == local.filter(kv => nodes(kv._1)),
            s"star labels must match union-find on $proper")
        }
      }
    }
  }

  test("weightedSample quota + determinism under random positive weights") {
    import graft.functions.Sampling
    forAllSeeded(Gen.zip(idDocGen, Gen.chooseNum(1, 5))) { case (docsList, k) =>
      if (docsList.nonEmpty) {
        val df = docsList.toDF("doc_id", "text")
          .withColumn("grp", (col("doc_id") % 3).cast("int"))
          .withColumn("w", (col("doc_id") % 7) + 1)
        val out = Sampling.weightedSample(df, Seq("grp"), "doc_id", col("w"), k, "p")
        assert(out.groupBy("grp").count().filter(col("count") > k).count() == 0)
        val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
        val b = Sampling.weightedSample(df, Seq("grp"), "doc_id", col("w"), k, "p")
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(a == b, "same salt must re-draw the same sample")
      }
    }
  }

  private val eventStreamGen: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      user <- Gen.chooseNum(1, 8)
      day <- Gen.chooseNum(0, 9)
    } yield (user.toLong, day.toLong))

  test("retention/stickiness invariants over arbitrary activity streams") {
    import graft.functions.Events
    val day = 86400000000L
    forAllSeeded(eventStreamGen) { evList =>
      if (evList.nonEmpty) {
        val ev = evList.toDF("user_id", "d")
          .withColumn("ts", timestamp_micros(col("d") * day)).drop("d")
        val users = ev.select("user_id").distinct().count()
        val ret = Events.retention(ev, "user_id", "ts").cache()
        // offset-0 row per cohort counts the cohort itself; cohort sizes
        // total to the user population
        val zeroSum = ret.filter(col("offset_days") === 0)
          .agg(sum(col("active_users"))).head().getLong(0)
        assert(zeroSum == users, "cohort sizes must partition the users")
        // no offset outranks its cohort's size
        val viol = ret.as("r").join(
          ret.filter(col("offset_days") === 0)
            .select(col("cohort_day"), col("active_users").as("c0")), Seq("cohort_day"))
          .filter(col("active_users") > col("c0")).count()
        assert(viol == 0, "an offset can never exceed its cohort size")
        ret.unpersist()
        // stickiness: dau <= wau always, so the ratio lives in (0, 1]
        val st = Events.stickiness(ev, "user_id", "ts")
        assert(st.filter(col("dau") > col("wau")).count() == 0)
        assert(st.filter(col("stickiness") <= 0.0 || col("stickiness") > 1.0).count() == 0)
      }
    }
  }

  test("temporalSplit partitions every row; embargo clears the gap") {
    import graft.functions.Sampling
    val day = 86400000000L
    forAllSeeded(Gen.zip(eventStreamGen, Gen.chooseNum(1, 3))) { case (evList, gap) =>
      if (evList.nonEmpty) {
        val ev = evList.zipWithIndex.map { case ((u, d), i) => (i.toLong, u, d) }
          .toDF("event_id", "user_id", "d")
          .withColumn("ts", timestamp_micros(col("d") * day)).drop("d")
        val out = Sampling.temporalSplit(ev, "ts", embargoDays = gap).cache()
        assert(out.count() == ev.count(), "every row must classify")
        assert(out.filter(!col("split").isin("train", "embargo", "test")).count() == 0)
        // the time axis is clean: max(train day) < min(embargo day) and the
        // train->test gap is strictly wider than the embargo band
        val mx = (s: String) => out.filter(col("split") === s)
          .agg(max(to_date(col("ts")))).head().getDate(0)
        val mn = (s: String) => out.filter(col("split") === s)
          .agg(min(to_date(col("ts")))).head().getDate(0)
        if (out.filter(col("split") === "embargo").count() > 0) {
          assert(mx("train").toLocalDate.isBefore(mn("embargo").toLocalDate))
          assert(java.time.temporal.ChronoUnit.DAYS.between(
            mx("train").toLocalDate, mn("embargo").toLocalDate) <= gap)
        }
        if (out.filter(col("split") === "test").count() > 0) {
          assert(java.time.temporal.ChronoUnit.DAYS.between(
            mx("train").toLocalDate, mn("test").toLocalDate) > gap,
            "test must clear the embargo band entirely")
        }
        out.unpersist()
      }
    }
  }

  test("prefix scan equals the single-partition window on arbitrary data") {
    import graft.core.Scans
    import org.apache.spark.sql.expressions.Window
    val gen = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-1000L, 1000L), Gen.chooseNum(-50L, 50L))),
      Gen.chooseNum(1, 9))
    forAllSeeded(gen) { case (rows, parts) =>
      // unique order keys (running totals over ties are ambiguous by contract)
      val data = rows.map(_._1).distinct.zip(rows.map(_._2))
        .toDF("k", "v")
      val got = Scans.cumulative(data, "k", Seq("v"), numPartitions = parts)
        .select("k", "cum_v").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, 0)
      val exp = data.select(col("k"), sum(col("v")).over(w).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == exp.toSeq)
    }
  }

  test("AUC antisymmetry and kappa symmetry on arbitrary score/label tables") {
    import graft.functions.{Curation, Stats}
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 20L), Gen.oneOf(true, false)))
    forAllSeeded(gen) { rows =>
      val df = rows.toDF("s", "y")
      val aucOf = (sc: org.apache.spark.sql.Column) =>
        Stats.rocAuc(df, sc, col("y")).collect()(0)
      val a = aucOf(col("s"))
      if (!a.isNullAt(2)) {
        // reversing the score reverses the ranking exactly (ties included)
        val rev = aucOf(-col("s"))
        assert(math.abs(a.getDouble(2) + rev.getDouble(2) - 1.0) <= 2e-6,
          s"AUC(s) + AUC(-s) must be 1: ${a.getDouble(2)} + ${rev.getDouble(2)}")
      }
      // kappa is rater-symmetric: the confusion matrix transposes, po/pe hold
      val ab = Curation.raterAgreement(df, col("y"), col("s") >= 10L)
        .collect()(0)
      val ba = Curation.raterAgreement(df, col("s") >= 10L, col("y"))
        .collect()(0)
      assert(ab.getAs[Double]("kappa") == ba.getAs[Double]("kappa") &&
        ab.getAs[Double]("po") == ba.getAs[Double]("po"))
    }
  }
}
