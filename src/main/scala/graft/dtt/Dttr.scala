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

  /** A custom external-row reader: (spark, drawn table, directive args,
    * baseDir) => rows. The reference runner loads these from a user
    * `config.py` (dttr.py:350-410); here they register programmatically
    * before `run`/`runDir`/`main`.
    */
  type Reader = (SparkSession, DrawnTable, Seq[String], String) => DataFrame

  private val customReaders =
    scala.collection.concurrent.TrieMap.empty[String, Reader]

  /** register a custom reader for `<keyword> args...` source directives */
  def registerReader(keyword: String, reader: Reader): Unit =
    customReaders(keyword) = reader

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
      case (other, args) =>
        customReaders.get(other)
          .map(r => r(spark, dt, args, baseDir))
          .getOrElse(throw new IllegalArgumentException(s"unknown dtt reader: $other"))
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

  /** CLI body: run a directory, print per-file results, return the failure
    * count (separated from `main` so tests can drive it without the process
    * exit / session teardown).
    */
  def runCli(spark: SparkSession, dir: String,
             etl: Map[String, DataFrame] => Map[String, DataFrame] = identity): Int = {
    val results = runDir(spark, dir, etl)
    results.foreach { case (f, err) =>
      println(err.fold(s"$f: OK")(m => s"$f: FAIL ${m.takeWhile(_ != '\n')}"))
    }
    val failures = results.count(_._2.isDefined)
    println(s"dttr: ${results.size - failures}/${results.size} files passed")
    failures
  }

  /** Standalone runner (the reference's executable `dttr`, dttr.py:350-410):
    * `runMain graft.dtt.Dttr <dir-with-.dtt-files>`. Exits nonzero when any
    * file fails. Custom readers registered via [[registerReader]] before
    * invocation apply (the reference's config.py hook).
    */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".")
    val hadSession = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = hadSession.getOrElse(
      SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
        .appName("graft-dttr")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val failures = runCli(spark, dir)
    if (hadSession.isEmpty) spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
