package graft.dtt

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Standalone `.dtt` file runner — the Spark port of the reference's `dttr`
  * (pygrametl/drawntabletesting/dttr.py:97-177, 350-410).
  *
  * File format (reference corpus: the .dtt files under
  * `tests/drawntabletesting/dttr`):
  * blocks separated by blank lines; each block is a header line followed by a
  * drawn table. A header of `name` is a PREcondition (the drawn rows are the
  * table's starting state); `name, assertion` is a POSTcondition checked
  * after the ETL hook runs (`equal` / `subset` / `disjoint`). `name@conn`
  * selects a named connection (here: a Spark catalog namespace prefix). A
  * final block line that does not start with `|` is an external row feed:
  * `csv <path> <delimiter>` or `sql <query>` (reference dttr.py:115-131) —
  * the drawn header then only declares the schema.
  *
  * The reference's `-e` ETL hook becomes the `etl` callback: it receives the
  * precondition tables (also registered as temp views, so `spark.sql` ETLs
  * work unchanged) and returns the final tables to assert on.
  */
object Dttr {

  final case class Block(name: String, connection: Option[String],
                         assertion: Option[String], drawing: String,
                         source: Option[(String, Seq[String])])

  /** split file content into blocks: header line + drawn table (+ optional
    * trailing external-source line)
    */
  def parseBlocks(content: String): Seq[Block] = {
    val groups = content.split("\r?\n").foldLeft(List(List.empty[String])) {
      case (acc, line) if line.trim.isEmpty =>
        if (acc.head.isEmpty) acc else Nil :: acc
      case (head :: tail, line) => (line :: head) :: tail
      case (Nil, line) => List(List(line))
    }.map(_.reverse).reverse.filter(_.nonEmpty)

    groups.map { g =>
      val header = g.head.trim
      val (namePart, assertion) = header.split(",").map(_.trim).toSeq match {
        case Seq(n) => (n, None)
        case Seq(n, a) => (n, Some(a.toLowerCase))
        case other => throw new IllegalArgumentException(s"bad dtt header: $header")
      }
      val (name, conn) = namePart.split("@").toSeq match {
        case Seq(n) => (n, None)
        case Seq(n, c) => (n, Some(c))
        case _ => throw new IllegalArgumentException(s"bad dtt table name: $namePart")
      }
      val body = g.tail
      // a last line not starting with | is an external source directive
      val (tableLines, source) =
        if (body.nonEmpty && !body.last.trim.startsWith("|")) {
          val parts = body.last.trim.split("\\s+").toSeq
          (body.dropRight(1), Some((parts.head, parts.tail)))
        } else (body, None)
      Block(name, conn, assertion, tableLines.mkString("\n"), source)
    }
  }

  private def loadSource(spark: SparkSession, dt: DrawnTable,
                         source: (String, Seq[String]), baseDir: String): DataFrame =
    source match {
      case ("csv", args) =>
        val path = args.head
        val delim = args.lift(1).getOrElse(",")
        val full = if (new java.io.File(path).isAbsolute) path else s"$baseDir/$path"
        spark.read.option("delimiter", delim).option("header", "false")
          .schema(dt.schema).csv(full)
      case ("sql", args) => spark.sql(args.mkString(" "))
      case (other, _) =>
        throw new IllegalArgumentException(s"unknown dtt reader: $other")
    }

  /** Run one `.dtt` file's content: materialize preconditions (registered as
    * temp views named `[conn__]name`), run the `etl` hook, check every
    * postcondition. Throws AssertionError on the first failed postcondition.
    * Returns the final table map for inspection.
    */
  def run(spark: SparkSession, content: String, baseDir: String = ".",
          etl: Map[String, DataFrame] => Map[String, DataFrame] = identity)
      : Map[String, DataFrame] = {
    val blocks = parseBlocks(content)
    def viewName(b: Block) = b.connection.map(c => s"${c}__${b.name}").getOrElse(b.name)

    val pre = blocks.filter(_.assertion.isEmpty).map { b =>
      val dt = DrawnTable(spark, b.drawing)
      val df = b.source.map(loadSource(spark, dt, _, baseDir)).getOrElse(dt.ensure())
      df.createOrReplaceTempView(viewName(b))
      viewName(b) -> df
    }.toMap

    val after = etl(pre)

    blocks.filter(_.assertion.isDefined).foreach { b =>
      val dt = DrawnTable(spark, b.drawing)
      val actual = after.getOrElse(viewName(b), spark.table(viewName(b)))
      b.assertion.get match {
        case "equal"    => dt.assertEqual(actual)
        case "subset"   => dt.assertSubset(actual)
        case "disjoint" => dt.assertDisjoint(actual)
        case a => throw new IllegalArgumentException(s"unknown dtt assertion: $a")
      }
    }
    after
  }

  /** Run every `.dtt` file in a directory (the reference runner's CLI mode,
    * dttr.py:350-410). Returns per-file success/failure messages; fails fast
    * only inside a file, never across files — mirroring dttr's
    * keep-going-per-file behavior.
    */
  def runDir(spark: SparkSession, dir: String,
             etl: Map[String, DataFrame] => Map[String, DataFrame] = identity)
      : Seq[(String, Option[String])] = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".dtt")).sortBy(_.getName)
    files.toSeq.map { f =>
      val content = new String(java.nio.file.Files.readAllBytes(f.toPath))
      val res = try { run(spark, content, dir, etl); None }
      catch { case e: Throwable => Some(e.getMessage) }
      f.getName -> res
    }
  }
}
