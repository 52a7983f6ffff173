package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential-integrity and reconciliation audits — the data-quality
  * gate a dimensional load runs BEFORE trusting a batch: the reference's
  * ensure/lookup machinery assumes facts reference real dimension rows
  * and rolled-up amounts agree with their lines; these operators measure
  * how true that is, as one-row verdicts cheap enough to run on every
  * batch (cf. pygrametl's decoupled consistency checking intent,
  * pygrametl/tables.py lookup failure paths).
  */
object Audits {

  /** Foreign-key audit between a child table and its parent: how many
    * child rows point at no parent (orphans — the rows `lookup` would
    * fail on), and how many parent keys no child references (childless —
    * dead dimension rows a cleanup could archive).
    *
    * Scale shape: each side collapses to its DISTINCT key table in one
    * map-side-combined aggregation (carrying the child's row count per
    * key so orphan ROWS are exact, not just orphan KEYS); the two
    * anti-checks are ONE full-outer join of the bounded key tables.
    * Zero row-level joins.
    *
    * Returns one row (n_child_rows, n_child_keys, n_orphan_rows,
    * n_orphan_keys, n_parent_keys, n_childless_parents, orphan_rate) —
    * rate at 6dp, NULL-keyed child rows count as orphans (they can never
    * join).
    */
  def fkAudit(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    fkAuditOfCounts(
      child.groupBy(col(childKey).as("__k")).agg(count(lit(1)).as("__rows")),
      parent.select(col(parentKey).as("__k")).distinct())

  /** [[fkAudit]]'s verdict over an already-built child key-count table
    * (__k, __rows — ADDITIVE per key) and distinct parent key frame —
    * the stage the streaming monitor shares with the batch operator.
    */
  def fkAuditOfCounts(childCounts: DataFrame, parentKeys: DataFrame): DataFrame = {
    val dec8 = org.apache.spark.sql.types.DecimalType(18, 8)
    val ck = childCounts
    val pk = parentKeys.withColumn("__p", lit(1))
    val j = ck.join(pk, Seq("__k"), "full_outer")
    j.agg(
      coalesce(sum(col("__rows")), lit(0L)).as("n_child_rows"),
      sum(when(col("__rows").isNotNull, 1L).otherwise(0L)).as("n_child_keys"),
      coalesce(sum(when(col("__p").isNull, col("__rows"))), lit(0L))
        .as("n_orphan_rows"),
      sum(when(col("__p").isNull && col("__rows").isNotNull, 1L)
        .otherwise(0L)).as("n_orphan_keys"),
      sum(when(col("__p").isNotNull, 1L).otherwise(0L)).as("n_parent_keys"),
      sum(when(col("__p").isNotNull && col("__rows").isNull, 1L)
        .otherwise(0L)).as("n_childless_parents"))
      .withColumn("orphan_rate",
        when(col("n_child_rows") === 0L, lit(null).cast("double"))
          .otherwise(round((col("n_orphan_rows").cast("double")
            / col("n_child_rows").cast("double")).cast(dec8), 6)
            .cast("double")))
  }

  /** Aggregate reconciliation: does each parent row's stored rollup
    * equal the sum of its children's contributions, within `tol` — the
    * totalprice-vs-lines check of a classic order load, generalized.
    * `childVal` should be an EXACT-DECIMAL expression (cast the operands
    * to decimals) so the per-parent sum, the difference, and the
    * tolerance verdict are exact and engine-reproducible — no float
    * accumulation order can flip a verdict.
    *
    * Scale shape: children collapse ONCE to per-key exact sums
    * (map-side combined); one equi-join against the parent; one global
    * reduce to the verdict row.
    *
    * Returns one row (n_parent, n_with_children, n_matched,
    * n_mismatched, n_missing_children, max_abs_diff) — max diff at 2dp.
    */
  def reconcileSum(parent: DataFrame, parentKey: String, parentVal: Column,
                   child: DataFrame, childKey: String, childVal: Column,
                   tol: Double = 0.01): DataFrame = {
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec = org.apache.spark.sql.types.DecimalType(28, 4)
    // both sides stage to the SAME decimal scale before subtraction, so
    // the diff, the tolerance verdict and the max are engine-exact
    val cs = child.groupBy(col(childKey).as("__k"))
      .agg(sum(childVal).cast(dec).as("__s"))
    val p = parent.select(col(parentKey).as("__k"),
      parentVal.cast(dec).as("__v"))
    val j = p.join(cs, Seq("__k"), "left")
    val diff = abs(col("__v") - col("__s"))
    j.agg(count(lit(1)).as("n_parent"),
      sum(when(col("__s").isNotNull, 1L).otherwise(0L)).as("n_with_children"),
      sum(when(diff <= lit(tol).cast(dec), 1L).otherwise(0L)).as("n_matched"),
      sum(when(diff > lit(tol).cast(dec), 1L).otherwise(0L)).as("n_mismatched"),
      sum(when(col("__s").isNull, 1L).otherwise(0L)).as("n_missing_children"),
      round(max(diff).cast(dec2), 2).cast("double").as("max_abs_diff"))
  }
}
