package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** SQLSource/JDBC semantics against an in-JVM Derby database (ships with
  * Spark): initsql, parameter binding, column renaming, round-trip sink.
  */
class JdbcSpec extends SparkSpec {

  private val conn = Jdbc.Conn("jdbc:derby:memory:graftdb;create=true")

  test("source: initsql + parameters + names (reference SQLSource surface)") {
    val df = Jdbc.source(spark, conn,
      query = "SELECT id, name FROM people WHERE id >= :minid AND name <> :skip ORDER BY id",
      names = Seq("person_id", "person_name"),
      initSql = Seq(
        "CREATE TABLE people (id INT, name VARCHAR(50))",
        "INSERT INTO people VALUES (1, 'ann'), (2, 'bob'), (3, 'eve'), (4, 'o''brien')"),
      parameters = Map("minid" -> 2, "skip" -> "eve"))
    assert(df.columns.toSeq == Seq("person_id", "person_name"))
    val rows = df.orderBy("person_id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq(2 -> "bob", 4 -> "o'brien")) // quoting survives ''-escape
  }

  test("bind: word-boundary anchored, skips quoted literals") {
    // :a must not rewrite the prefix of :ab
    assert(Jdbc.bind("SELECT :a, :ab", Map("a" -> 1, "ab" -> 2)) == "SELECT 1, 2")
    // :name inside a string literal is data, not a placeholder
    assert(Jdbc.bind("SELECT ':skip', :skip FROM t", Map("skip" -> "x"))
      == "SELECT ':skip', 'x' FROM t")
    // ''-escaped quotes inside literals do not end the literal
    assert(Jdbc.bind("SELECT 'it''s :a here', :a", Map("a" -> 7))
      == "SELECT 'it''s :a here', 7")
    // replacement values containing '$' or '\' survive regex replacement
    assert(Jdbc.bind("SELECT :v", Map("v" -> "a$b\\c")) == "SELECT 'a$b\\c'")
    // a substituted VALUE containing a :name-shaped substring is never
    // re-substituted (single-pass replacement)
    assert(Jdbc.bind("SELECT :a, :b", Map("a" -> "see :b here", "b" -> 1))
      == "SELECT 'see :b here', 1")
  }

  test("bind: skips comments and double-quoted identifiers") {
    // :name inside a -- line comment is not substituted
    assert(Jdbc.bind("SELECT :a -- not :a here\nFROM t", Map("a" -> 1))
      == "SELECT 1 -- not :a here\nFROM t")
    // :name inside a block comment is not substituted
    assert(Jdbc.bind("SELECT /* :a */ :a FROM t", Map("a" -> 2))
      == "SELECT /* :a */ 2 FROM t")
    // an unterminated block comment is skipped to end-of-query
    assert(Jdbc.bind("SELECT :a /* trailing :a", Map("a" -> 3))
      == "SELECT 3 /* trailing :a")
    // :name inside a double-quoted identifier is part of the name, not a
    // placeholder (ANSI delimited identifiers, ""-escape included)
    assert(Jdbc.bind("SELECT \":a\", :a FROM t", Map("a" -> 4))
      == "SELECT \":a\", 4 FROM t")
    assert(Jdbc.bind("SELECT \"odd\"\":a\" FROM t WHERE x = :a", Map("a" -> 4))
      == "SELECT \"odd\"\":a\" FROM t WHERE x = 4")
    // a quote opened inside a comment does not start a literal
    assert(Jdbc.bind("SELECT :a -- it's fine\n, :a", Map("a" -> 5))
      == "SELECT 5 -- it's fine\n, 5")
    // a comment marker inside a literal does not start a comment
    assert(Jdbc.bind("SELECT '--', :a", Map("a" -> 6)) == "SELECT '--', 6")
  }

  test("sink + re-read round trip (batched JDBC writes)") {
    import spark.implicits._
    // Spark's JDBC writer quotes identifiers -> case-sensitive in Derby;
    // uppercase names keep the table queryable with unquoted SQL
    val out = Seq((10L, "x", 1.5), (11L, "y", 2.5)).toDF("K", "S", "V")
    Jdbc.sink(out, conn, "sunk", SaveMode.Overwrite)
    val back = Jdbc.source(spark, conn, "SELECT k, s, v FROM sunk")
    assert(back.count() == 2)
    assert(back.agg(sum("v")).head().getDouble(0) == 4.0)
  }

  test("partitioned parallel read splits into range queries") {
    import spark.implicits._
    Jdbc.execute(conn, "CREATE TABLE big (id INT, val VARCHAR(10))")
    // bulk rows via the sink (batched inserts, not one statement per row)
    Jdbc.sink((1 to 100).map(i => (i, s"v$i")).toDF("ID", "VAL"), conn, "big")
    val df = Jdbc.source(spark, conn, "SELECT id, val FROM big",
      partition = Some(("id", 1L, 100L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }
}
