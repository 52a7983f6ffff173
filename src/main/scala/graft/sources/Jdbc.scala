package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink recipes with the reference `SQLSource` semantics.
  *
  * Reference: pygrametl/datasources.py:135-217 — `SQLSource(connection,
  * query, names, initsql, cursorarg, parameters, fetchsize)`: run `initsql`
  * once, execute `query` with bound `parameters`, iterate the result set,
  * optionally renaming columns to `names`. The reference streams rows through
  * one cursor; here the read is Spark's JDBC relation, which pushes the query
  * to the database and (when a partition column is given) reads in parallel —
  * the distributed replacement for `fetchsize` batching.
  *
  * Scale notes: a single-query JDBC read is one connection on one executor;
  * for big tables pass `partition = Some((column, lower, upper, n))` so Spark
  * issues n range-partitioned queries. Predicates on the returned DataFrame
  * push down into the remote SQL (Catalyst JDBC pushdown), so prefer
  * filtering in Spark over baking filters into `query`.
  */
object Jdbc {

  /** Connection descriptor (url + driver properties). */
  final case class Conn(url: String, props: Map[String, String] = Map.empty) {
    def properties: java.util.Properties = {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      p
    }
  }

  /** Run statements over a plain JDBC connection (the `initsql` hook — e.g.
    * session setup, temp tables). Each statement executes in order; DDL and
    * DML both allowed.
    */
  def execute(conn: Conn, statements: String*): Unit = {
    val c = java.sql.DriverManager.getConnection(conn.url, conn.properties)
    try {
      val st = c.createStatement()
      try statements.foreach(st.execute)
      finally st.close()
    } finally c.close()
  }

  /** Substitute `:name` parameters as safely-quoted SQL literals — the
    * set-oriented stand-in for the reference's per-row bound parameters
    * (pygrametl executes the query once per iteration anyway; here it runs
    * exactly once on the database).
    *
    * Substitution is word-boundary anchored and skips, in one segmenting
    * pass, every region where a `:name` is data rather than a placeholder:
    * single-quoted string literals, double-quoted identifiers, `--` line
    * comments, and `/&#42; &#42;/` block comments (an unterminated block
    * comment is skipped to end-of-query). Values escape by quote-doubling,
    * which is safe for ANSI-conformant dialects; parameters must still be
    * TRUSTED under backslash-escaping dialects (e.g. MySQL with default
    * sql_mode) — use database-side prepared statements for hostile input.
    */
  private val skipRegion =
    """'(?:[^']|'')*'|"(?:[^"]|"")*"|--[^\r\n]*|/\*(?:[\s\S]*?\*/|[\s\S]*$)""".r

  private[graft] def bind(query: String, parameters: Map[String, Any]): String = {
    if (parameters.isEmpty) return query
    def litOf(v: Any): String = v match {
      case null => "NULL"
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Double => n.toString
      case n: Float => n.toString
      case n: java.math.BigDecimal => n.toPlainString
      case b: Boolean => if (b) "TRUE" else "FALSE"
      case s => "'" + s.toString.replace("'", "''") + "'"
    }
    // ONE pass over all placeholders (longest name first so :a never eats
    // :ab's prefix): sequential per-parameter folds would re-scan earlier
    // parameters' substituted VALUES and corrupt them when a value contains
    // a :name-shaped substring
    val names = parameters.keys.toSeq.sortBy(-_.length)
      .map(java.util.regex.Pattern.quote).mkString("|")
    val placeholder = (":(" + names + ")\\b").r
    def subst(segment: String): String =
      placeholder.replaceAllIn(segment,
        m => java.util.regex.Matcher.quoteReplacement(litOf(parameters(m.group(1)))))
    val sb = new StringBuilder
    var last = 0
    for (m <- skipRegion.findAllMatchIn(query)) {
      sb.append(subst(query.substring(last, m.start))).append(m.matched)
      last = m.end
    }
    sb.append(subst(query.substring(last)))
    sb.toString
  }

  /** SQLSource: one SQL query against a live database as a DataFrame.
    *
    * - `names`: rename the result columns (reference `names` tuple)
    * - `initSql`: statements executed once before the read
    * - `parameters`: `:name` placeholders bound as literals
    * - `fetchSize`: per-connection row fetch granularity
    * - `partition`: (column, lower, upper, numPartitions) for a parallel
    *   range-partitioned read — the 100 TB path
    */
  def source(spark: SparkSession, conn: Conn, query: String,
             names: Seq[String] = Nil,
             initSql: Seq[String] = Nil,
             parameters: Map[String, Any] = Map.empty,
             fetchSize: Int = 1000,
             partition: Option[(String, Long, Long, Int)] = None): DataFrame = {
    if (initSql.nonEmpty) execute(conn, initSql: _*)
    val bound = bind(query, parameters)
    var reader = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("query", bound)
      .option("fetchsize", fetchSize.toString)
    conn.props.foreach { case (k, v) => reader = reader.option(k, v) }
    partition.foreach { case (c, lo, hi, n) =>
      // partitioned reads require dbtable instead of query
      reader = spark.read.format("jdbc")
        .option("url", conn.url)
        .option("dbtable", s"($bound) AS graft_sub")
        .option("partitionColumn", c).option("lowerBound", lo.toString)
        .option("upperBound", hi.toString).option("numPartitions", n.toString)
        .option("fetchsize", fetchSize.toString)
      conn.props.foreach { case (k, v) => reader = reader.option(k, v) }
    }
    val df = reader.load()
    if (names.isEmpty) df else df.toDF(names: _*)
  }

  /** JDBC sink: batched inserts (the reference's `executemany`/bulk path,
    * tables.py:2328-2351, collapses into Spark's batched JDBC writer).
    */
  def sink(df: DataFrame, conn: Conn, table: String,
           mode: SaveMode = SaveMode.Append, batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .options(conn.props)
      .mode(mode)
      .save()
}
