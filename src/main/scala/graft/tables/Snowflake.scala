package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snowflaked dimension: a tree of Dimension objects linked by FK references
  * where the FK attribute name equals the referenced dimension's key name.
  *
  * Reference: pygrametl/tables.py:1721-2133 (`SnowflakedDimension`). The
  * reference's `ensure` recurses per row, resolving higher (referenced)
  * levels first so their keys exist before the referencing level is ensured
  * (tables.py:2061-2103, `__ensure_helper`). Set-wise: a static topological
  * sort of the tree (≈ `levellist`, tables.py:1823-1826); for each level from
  * the leaves toward the root, bulk-ensure that level and join its new key
  * column onto the working DataFrame — the per-row recursion becomes a chain
  * of `ensure` plans.
  */
class SnowflakedDimension(val references: Seq[(Dimension, Seq[Dimension])]) extends ManagedTable {

  val root: Dimension = {
    val referenced = references.flatMap(_._2).toSet
    val referencing = references.map(_._1)
    (referencing.toSet -- referenced).headOption.getOrElse(referencing.head)
  }

  def name: String = root.name
  def current: DataFrame = root.current

  /** leaves-first ordering of all dimensions in the tree */
  def levelOrder: Seq[Dimension] = {
    val children: Map[Dimension, Seq[Dimension]] = references.toMap
    val out = scala.collection.mutable.LinkedHashSet[Dimension]()
    def visit(d: Dimension): Unit = {
      children.getOrElse(d, Nil).foreach(visit)
      out += d
    }
    visit(root)
    out.toSeq
  }

  /** Bulk ensure through the snowflake: for each level (deepest first) ensure
    * members and attach the level's surrogate key to the working rows; the
    * parent level's lookupatts/attributes may then include that key.
    * Returns the input with the root key resolved.
    */
  def ensure(df: DataFrame): DataFrame =
    levelOrder.foldLeft(df) { (work, dim) =>
      dim.ensure(work.select(work.columns.distinct.map(col): _*))
    }

  /** scdensure: ensure every non-root level (leaves first, attaching each
    * level's surrogate key to the working rows), then SCD2-ensure at the
    * root — the reference supports SCD only at the root of the snowflake
    * (tables.py:2105-2133, "we require that only the root is a
    * SlowlyChangingDimension"). Returns the root dimension's new state.
    */
  def scdensure(df: DataFrame, fromCol: Column,
                newVersionOnNewFrom: Boolean = false): DataFrame = {
    val scdRoot = root match {
      case s: ScdDimension => s
      case other => throw new IllegalArgumentException(
        s"scdensure requires the snowflake root (${other.name}) to be an ScdDimension")
    }
    val ensured = levelOrder.filterNot(_ eq root).foldLeft(df) { (work, dim) =>
      dim.ensure(work.select(work.columns.distinct.map(col): _*))
    }
    scdRoot.scdensure(ensured, fromCol, newVersionOnNewFrom)
  }

  /** lookup: NATURAL-JOIN-style full-row fetch across all snowflake tables.
    * Reference: tables.py:1811-1883 — chained equi joins root→leaves on the
    * shared key names. Each level broadcasts only when small (size-gated).
    */
  def lookupFullRow(keys: DataFrame): DataFrame =
    levelOrder.reverse.foldLeft(keys) { (work, dim) =>
      work.join(graft.core.Joins.maybeBroadcast(dim.current), Seq(dim.key), "left")
    }
}
