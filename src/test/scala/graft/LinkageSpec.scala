package graft

import org.apache.spark.sql.functions._
import graft.functions.Linkage

class LinkageSpec extends SparkSpec {

  test("blockedLink: true pairs found, blocks isolate, whale blocks drop") {
    import spark.implicits._
    val dim = Seq((1L, "ACME Corp.", 10), (2L, "Acme Inc", 10), (3L, "Zeta LLC", 20))
      .toDF("id", "name", "nation")
    val in = Seq((101L, "acme corp", 10), (102L, "ZETA llc", 20),
      (103L, "acme corp", 20)).toDF("in_id", "in_name", "in_nation")
    val out = Linkage.blockedLink(dim, in, "id", "in_id", "name", "in_name",
        Seq("nation" -> "in_nation"), prefixLen = 3, minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // case/punctuation differences normalize away to an exact match
    assert(out((1L, 101L)) == 1.0 && out((3L, 102L)) == 1.0)
    // a genuinely different name in the same block scores below the floor
    assert(!out.contains((2L, 101L)))
    // same name, different nation: blocking isolates it completely
    assert(!out.keys.exists(_._2 == 103L))
    // a degenerate block bigger than maxBlock is dropped, never exploded
    val whaleL = (1 to 20).map(i => (i.toLong, "Same Name", 1)).toDF("id", "name", "nation")
    val whaleR = Seq((500L, "Same Name", 1)).toDF("in_id", "in_name", "in_nation")
    assert(Linkage.blockedLink(whaleL, whaleR, "id", "in_id", "name", "in_name",
      Seq("nation" -> "in_nation"), maxBlock = 10).count() == 0)
  }

  test("blockedLink on the corpus: every perturbed incoming row finds its source") {
    val c = table("customer")
    val incoming = c.filter(col("c_custkey") % 4 === 0)
      .select((col("c_custkey") + 1000000L).as("in_id"),
        concat(col("c_name").substr(lit(1), length(col("c_name")) - 1), lit("x"))
          .as("in_name"),
        col("c_nationkey").as("in_nation"))
    val links = Linkage.blockedLink(
        c.select(col("c_custkey"), col("c_name"), col("c_nationkey")), incoming,
        "c_custkey", "in_id", "c_name", "in_name",
        Seq("c_nationkey" -> "in_nation"), minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = incoming.select("in_id").collect().map(_.getLong(0))
    assert(expected.nonEmpty)
    expected.foreach { in =>
      assert(links.contains((in - 1000000L, in)), s"source of $in not linked") }
  }
}
