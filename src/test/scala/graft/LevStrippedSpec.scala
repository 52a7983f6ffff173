package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Pins graft.plans.LevenshteinStripped to Spark's own threshold
  * levenshtein: exact distance when ≤ bound, −1 above it, on random
  * strings (ASCII and multi-byte), adversarial affix shapes, and the
  * real linkage candidate stream.
  */
class LevStrippedSpec extends SparkSpec {
  import spark.implicits._

  private val bridge = org.apache.spark.sql.graftbridge.Bridge
  private def sparkLev(a: Column, b: Column, k: Column): Column =
    bridge.column(org.apache.spark.sql.catalyst.expressions.Levenshtein(
      bridge.expression(a), bridge.expression(b), Some(bridge.expression(k))))
  private def ours(a: Column, b: Column, k: Column): Column =
    graft.plans.NativeFunctions.levenshteinStripped(a, b, k)

  private def check(rows: Seq[(String, String, Int)]): Unit = {
    val bad = rows.toDF("a", "b", "k")
      .select(ours(col("a"), col("b"), col("k")).as("n"),
        sparkLev(col("a"), col("b"), col("k")).as("r"),
        col("a"), col("b"), col("k"))
      .filter(col("n") =!= col("r"))
      .collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString("; ")}")
  }

  test("edges: empty, identical, pure affixes, overlap traps") {
    check(Seq(
      ("", "", 0), ("", "abc", 2), ("", "abc", 3), ("abc", "", 3),
      ("abc", "abc", 0), ("aa", "aaa", 1), ("aaa", "aa", 0),
      ("aba", "ab", 1), ("ab", "ba", 1), ("ab", "ba", 2),
      ("abcdef", "bcdefa", 2), ("abcdef", "bcdefa", 6),
      ("customer 000000488", "customer 000000483", 2),
      ("customer 000000488", "customer 00000048x", 1),
      ("xaaaay", "xaaay", 3), ("prefix-mid-suffix", "prefix-mud-suffix", 1),
      ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("über café", "uber cafe", 4), ("自然言語", "自然言吾", 2),
      ("mixedASCII自然", "mixedASCII自然x", 1)))
  }

  test("property: random ASCII pairs match Spark at every bound") {
    val g = for {
      a <- Gen.listOf(Gen.oneOf(('a' to 'd') :+ ' ' :+ '0')).map(_.mkString)
      b <- Gen.listOf(Gen.oneOf(('a' to 'd') :+ ' ' :+ '0')).map(_.mkString)
      k <- Gen.choose(0, 6)
    } yield (a.take(24), b.take(24), k)
    val rows = Gen.listOfN(400, g).sample.get
    check(rows)
  }

  test("property: random multi-byte pairs take the delegate path intact") {
    val alphabet = Seq('å', 'ß', '語', 'a', '1', ' ')
    val g = for {
      a <- Gen.listOf(Gen.oneOf(alphabet)).map(_.mkString)
      b <- Gen.listOf(Gen.oneOf(alphabet)).map(_.mkString)
      k <- Gen.choose(0, 5)
    } yield (a.take(12), b.take(12), k)
    check(Gen.listOfN(200, g).sample.get)
  }

  test("linkage candidate stream: identical on the real block join") {
    val c = table("customer")
    val nn = (x: Column) => trim(regexp_replace(lower(x), "[^a-z0-9]+", " "))
    val L = c.select(nn(col("c_name")).as("a"), col("c_nationkey").as("k1"))
    val R = c.filter(col("c_custkey") % 4 === 0)
      .select(nn(col("c_name")).as("b"), col("c_nationkey").as("k2"))
    val cand = L.join(R, col("k1") === col("k2") &&
      substring(col("a"), 1, 3) === substring(col("b"), 1, 3))
    val bad = cand
      .select(ours(col("a"), col("b"), lit(3)).as("n"),
        sparkLev(col("a"), col("b"), lit(3)).as("r"))
      .filter(col("n") =!= col("r")).count()
    assert(bad === 0L)
  }
}
