package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions equal their Column-API expressions") {
    GraftExtensions.register(spark)
    table("documents").createOrReplaceTempView("ext_docs")

    // graft_shingles + graft_minhash + graft_sigmatch through pure SQL vs
    // the same pipeline built from the Column API
    val sql = spark.sql("""
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        graft_sigmatch(
          graft_minhash(graft_shingles(split(trim(regexp_replace(
            regexp_replace(lower(a.text), '[^a-z0-9]+', ' '), ' +', ' ')), ' '), 3), 32),
          graft_minhash(graft_shingles(split(trim(regexp_replace(
            regexp_replace(lower(b.text), '[^a-z0-9]+', ' '), ' +', ' ')), ' '), 3), 32)
        ) AS sm
      FROM ext_docs a JOIN ext_docs b ON a.doc_id < b.doc_id
      WHERE a.doc_id < 20 AND b.doc_id < 20""")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    import graft.plans.NativeFunctions
    def sig(c: org.apache.spark.sql.Column) =
      NativeFunctions.minhashSignature(
        NativeFunctions.ngramShingles(graft.functions.TextAnalysis.tokens(c), 3), 32)
    val d = table("documents").filter(col("doc_id") < 20)
    val api = d.select(col("doc_id").as("id_a"), sig(col("text")).as("sa"))
      .crossJoin(d.select(col("doc_id").as("id_b"), sig(col("text")).as("sb")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        NativeFunctions.sigMatchFraction(col("sa"), col("sb")).as("sm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sql == api, "SQL surface must compute the identical signatures")
    assert(sql.nonEmpty)

    // the aggregate sketch registers too: top token via SQL vs Aggregators
    val viaSql = spark.sql("""
      SELECT graft_freq_items(tok, 8) AS fi FROM (
        SELECT explode(split(trim(regexp_replace(regexp_replace(lower(text),
          '[^a-z0-9]+', ' '), ' +', ' ')), ' ')) AS tok FROM ext_docs) WHERE tok <> ''
    """).head().getSeq[org.apache.spark.sql.Row](0)
    assert(viaSql.nonEmpty && viaSql.forall(_.getLong(1) > 0))

    // the startup path wires the same builders without error
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("shape arguments must be literals — a column there is a clear error") {
    GraftExtensions.register(spark)
    table("documents").createOrReplaceTempView("ext_docs")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles(split(text, ' '), doc_id) FROM ext_docs").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"),
      s"expected a literal-argument error, got: ${err.getMessage}")
  }
}
