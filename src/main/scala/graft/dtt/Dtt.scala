package graft.dtt

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drawn Table Testing (DTT) for Spark.
  *
  * Reference: pygrametl/drawntabletesting/__init__.py — expected table state
  * is an ASCII drawing; `ensure()` creates the precondition, `assertEqual` /
  * `assertSubset` / `assertDisjoint` are set-comparison postconditions with
  * pretty-printed violations. Variables: `$_` matches anything, `$_!` matches
  * any non-NULL value, `$name` must bind to the same value everywhere it
  * appears (drawntabletesting/__init__.py:694-769).
  *
  * Type lexicon follows the reference (drawntabletesting/__init__.py:114-128):
  * int-family → long, real/double → double, char/text/date/timestamp → string
  * (dates compared textually, as in the reference's str mapping).
  */
final case class DrawnTable(spark: SparkSession, drawing: String) {

  private val lines = drawing.linesIterator.map(_.trim).filter(_.startsWith("|")).toSeq
  require(lines.nonEmpty, "drawn table needs at least a header row")

  private def cells(line: String): Seq[String] =
    line.stripPrefix("|").stripSuffix("|").split("\\|").map(_.trim).toSeq

  /** header cells: `name:type` with optional ` (pk)` suffix */
  val columns: Seq[(String, DataType)] = cells(lines.head).map { h =>
    val noPk = h.replaceAll("\\(pk\\)", "").trim
    val Array(name, typ) = noPk.split(":").map(_.trim)
    val dt = typ.toLowerCase match {
      case "smallint" | "int" | "integer" | "bigint" | "decimal" | "numeric" => LongType
      case "real" | "double precision" | "double" | "float" => DoubleType
      case _ => StringType
    }
    name -> dt
  }

  val primaryKey: Seq[String] = cells(lines.head)
    .filter(_.contains("(pk)")).map(_.replaceAll("\\(pk\\)", "").trim.split(":").head.trim)

  val schema: StructType = StructType(columns.map { case (n, t) => StructField(n, t) })

  private val dataLines = lines.tail.filterNot(_.matches("\\|[\\s|-]*\\|?"))

  /** raw string cells per data row (variables preserved) */
  val rawRows: Seq[Seq[String]] = dataLines.map(cells)

  private def isVar(s: String) = s.startsWith("$")

  private def parse(cell: String, dt: DataType): Any = cell match {
    case "NULL" | "" => null
    case v => dt match {
      case LongType => v.toLong
      case DoubleType => v.toDouble
      case _ => v
    }
  }

  /** the drawing as a DataFrame; variable cells become NULL (only valid when
    * the drawing is variable-free, e.g. as a precondition)
    */
  lazy val df: DataFrame = {
    val rows = rawRows.map(r => Row.fromSeq(r.zip(columns).map { case (c, (_, dt)) =>
      if (isVar(c)) null else parse(c, dt)
    }))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1), schema)
  }

  /** precondition: materialize the drawn rows (reference `Table.ensure`) */
  def ensure(): DataFrame = df

  // ---- table lifecycle (reference drawntabletesting/__init__.py:241-400) ----
  // The reference manages real DB tables; here the backing store is the Spark
  // temp-view catalog, so create/drop/reset are view registrations.

  /** create: register the drawn rows as temp view `name` (reference
    * `Table.create` + initial insert).
    */
  def create(name: String): DataFrame = { df.createOrReplaceTempView(name); df }

  /** reset: drop whatever state the view holds and restore the drawn rows —
    * the reference's drop-create-insert cycle used between test cases.
    */
  def reset(name: String): DataFrame = create(name)

  /** drop: remove the view (reference `Table.drop`). */
  def drop(name: String): Unit = { spark.catalog.dropTempView(name); () }

  /** ensure(name): create the view if absent, otherwise VERIFY its content
    * still equals the drawing (raising on divergence) — the reference's
    * `Table.ensure` contract.
    */
  def ensure(name: String): DataFrame =
    if (spark.catalog.tableExists(name)) {
      val cur = spark.table(name)
      assertEqual(cur)
      cur
    } else create(name)

  /** additems: append extra rows beyond the drawing (reference
    * `Table.additems` — rows the test needs present but irrelevant to the
    * drawn expectation). Values follow the drawn column order.
    */
  def addItems(name: String, items: Seq[Seq[Any]]): DataFrame = {
    val extra = spark.createDataFrame(
      spark.sparkContext.parallelize(items.map(Row.fromSeq).toList, 1), schema)
    val combined = spark.table(name).unionByName(extra)
    combined.createOrReplaceTempView(name)
    combined
  }

  private def fmt(rows: Seq[Seq[Any]]): String =
    rows.map(_.mkString("| ", " | ", " |")).mkString("\n")

  private def actualRows(actual: DataFrame): Seq[Seq[Any]] =
    actual.select(columns.map(c => col(c._1).cast(c._2)): _*)
      .collect().map(_.toSeq).toSeq

  /** Match drawn rows against actual rows honoring `$_`, `$_!` and named
    * variables; returns (unmatchedDrawn, bindingViolations).
    */
  private def matchRows(actual: Seq[Seq[Any]]): (Seq[Seq[String]], Seq[String]) = {
    val bindings = scala.collection.mutable.Map[String, Any]()
    val remaining = scala.collection.mutable.ArrayBuffer(actual: _*)
    val unmatched = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val violations = scala.collection.mutable.ArrayBuffer[String]()

    def rowOk(drawn: Seq[String], actualRow: Seq[Any], commit: Boolean): Boolean = {
      val trial = scala.collection.mutable.Map[String, Any]()
      val ok = drawn.zip(actualRow).zip(columns).forall { case ((d, v), (_, dt)) =>
        d match {
          case "$_" => true
          case "$_!" => v != null
          case x if isVar(x) =>
            bindings.get(x).orElse(trial.get(x)) match {
              case Some(bound) => bound == v
              case None => trial(x) = v; true
            }
          case x => parse(x, dt) == v
        }
      }
      if (ok && commit) bindings ++= trial
      ok
    }

    rawRows.foreach { drawn =>
      val idx = remaining.indexWhere(a => rowOk(drawn, a, commit = false))
      if (idx >= 0) { rowOk(drawn, remaining(idx), commit = true); remaining.remove(idx) }
      else unmatched += drawn
    }
    (unmatched.toSeq, violations.toSeq)
  }

  /** postcondition: actual content equals the drawing (as a multiset, with
    * variable matching). Reference: assertEqual.
    */
  def assertEqual(actual: DataFrame): Unit = {
    val act = actualRows(actual)
    val (unmatchedDrawn, _) = matchRows(act)
    val extra = act.size - (rawRows.size - unmatchedDrawn.size)
    if (unmatchedDrawn.nonEmpty || act.size != rawRows.size)
      throw new AssertionError(
        s"""assertEqual failed: drawn=${rawRows.size} actual=${act.size}
           |unmatched drawn rows:
           |${fmt(unmatchedDrawn)}
           |actual rows:
           |${fmt(act)}""".stripMargin)
  }

  /** postcondition: every drawn row appears in the actual content. */
  def assertSubset(actual: DataFrame): Unit = {
    val (unmatchedDrawn, _) = matchRows(actualRows(actual))
    if (unmatchedDrawn.nonEmpty)
      throw new AssertionError(
        s"assertSubset failed; drawn rows not found:\n${fmt(unmatchedDrawn)}")
  }

  /** postcondition: no drawn row appears in the actual content. */
  def assertDisjoint(actual: DataFrame): Unit = {
    val act = actualRows(actual)
    val matched = rawRows.size - matchRows(act)._1.size
    if (matched > 0)
      throw new AssertionError(s"assertDisjoint failed: $matched drawn row(s) present")
  }
}
