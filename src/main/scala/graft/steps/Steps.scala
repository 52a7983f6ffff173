package graft.steps

import org.apache.spark.sql.{Column, DataFrame}

/** Step-pipeline combinators.
  *
  * Reference: pygrametl/steps.py — a push-based row pipeline where each
  * `Step` processes one row and forwards it. In a lazy plan engine the
  * pipeline IS the plan: chaining transformations composes steps, and the
  * runtime plumbing (`Step`/`connectsteps`/`_redirect`, steps.py:51-169)
  * disappears. What remains semantically is routing and fan-out.
  */
object Steps {

  /** ConditionalStep (steps.py:390-422): route rows into a true branch and a
    * false branch (the reference can discard the false branch — just drop it).
    */
  def conditional(df: DataFrame, pred: Column): (DataFrame, DataFrame) =
    (df.filter(pred), df.filter(!pred))

  /** CopyStep (steps.py:425-461): feed the same rows to several downstream
    * pipelines. Lazy plans share the scan for free; set `cache` when several
    * consumers would otherwise rescan an expensive upstream.
    *
    * `cache=true` materializes via an eager localCheckpoint rather than
    * `.cache()`: the blocks are released by the ContextCleaner as soon as the
    * source frame is unreferenced, instead of pinning an entry in the
    * CacheManager until someone remembers to unpersist.
    */
  def copyTo(df: DataFrame, consumers: Seq[DataFrame => DataFrame],
             cache: Boolean = false): Seq[DataFrame] = {
    val src = if (cache) org.apache.spark.sql.graftbridge.Bridge.freeze(df) else df
    consumers.map(f => f(src))
  }

  /** MappingStep (steps.py:172-204): apply per-column fns. The reference
    * default `requiretargets=True` raises KeyError when a mapped attribute is
    * absent; the analysis-time analogue is a `require` naming the missing
    * columns, and it is the default here too — a ported pipeline fails loudly
    * on a misspelled target instead of silently skipping it. Pass
    * `requireTargets=false` for the tolerant variant (absent columns skipped).
    */
  def mapping(df: DataFrame, fns: Map[String, Column => Column],
              requireTargets: Boolean = true): DataFrame = {
    if (requireTargets) {
      val missing = fns.keys.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"MappingStep: missing target column(s) ${missing.mkString(", ")} " +
          s"(has: ${df.columns.mkString(", ")})")
    }
    fns.filter { case (c, _) => df.columns.contains(c) }
      .foldLeft(df) { case (d, (c, f)) => d.withColumn(c, f(org.apache.spark.sql.functions.col(c))) }
  }

  /** chain of whole-frame transforms (the pipeline itself) */
  def pipeline(df: DataFrame, steps: (DataFrame => DataFrame)*): DataFrame =
    steps.foldLeft(df)((d, f) => f(d))

  /** PrintStep (steps.py:259-278): debug tap — print up to `rows` rows to
    * the configured sink and pass the frame through unchanged. The tap runs
    * eagerly (the reference prints as rows flow; a lazy plan would print
    * nothing until an action), but samples only `rows` rows — it never
    * collects the frame.
    */
  def printStep(df: DataFrame, rows: Int = 20,
                out: String => Unit = println): DataFrame = {
    out(df.showString_(rows))
    df
  }

  /** GarbageStep (steps.py:373-387): terminal sink that discards its input.
    * In a lazy engine an unconsumed branch simply never executes; `garbage`
    * makes the discard explicit when an API expects a consumer (e.g. the
    * false branch of [[conditional]]) — it returns nothing and triggers
    * nothing.
    */
  def garbage(df: DataFrame): Unit = ()

  /** eager row preview without collect()ing the whole frame — Dataset.show
    * renders driver-side from a take(rows+1)
    */
  implicit private class ShowString(df: DataFrame) {
    def showString_(rows: Int): String = {
      val taken = df.take(rows + 1)
      val hasMore = taken.length > rows
      val shown = taken.take(rows)
      val header = df.columns.mkString(", ")
      val body = shown.map(_.toSeq.map(v => if (v == null) "NULL" else v.toString)
        .mkString(", ")).mkString("\n")
      s"$header\n$body" + (if (hasMore) "\n..." else "")
    }
  }
}
