package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams — the funnel: how far does
  * each user get through a strictly-ordered chain of event types (view →
  * click → signup → purchase), where step i counts only if it happens
  * STRICTLY AFTER the user's step i−1. (Reference scope: pygrametl models
  * events as fact rows; sequential-pattern analytics is an additive
  * extension like §2.9 streaming.)
  *
  * Scale shape: step i is ONE aggregation `min(ts) where type = sᵢ and
  * ts > tᵢ₋₁` keyed by the user — k steps = k user-keyed shuffles of
  * already-filtered slices (the type filter pushes to the scan), never a
  * per-user sort or a self-join over the raw stream. Funnels are short
  * (k ≤ 10); each stage's state is one row per surviving user.
  */
object Events {

  /** Per-user funnel progress: the earliest strictly-increasing timestamp
    * chain through `steps`. Returns (userCol, step_1_ts..step_k_ts,
    * steps_completed); a user absent from step 1 appears with all-null
    * steps and 0 completed.
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val users = df.select(col(userCol)).distinct()
    val stages = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val slice = df.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol).as("__ts"))
        val gated = prev match {
          case None => slice
          case Some(p) => slice
            .join(p.select(col(userCol), col(s"step_${i}_ts").as("__prev")), Seq(userCol))
            .filter(col("__ts") > col("__prev"))
        }
        Some(gated.groupBy(col(userCol)).agg(min(col("__ts")).as(s"step_${i + 1}_ts")))
    }.flatten
    val joined = stages.foldLeft(users)((acc, st) => acc.join(st, Seq(userCol), "left"))
    // gating makes step i+1 non-null imply step i non-null, so the furthest
    // step is the max set indicator
    val nCompleted = steps.indices.map(i =>
      when(col(s"step_${i + 1}_ts").isNotNull, lit(i + 1)).otherwise(lit(0)))
      .reduce((a, b) => greatest(a, b))
    joined.select((col(userCol) +: steps.indices.map(i => col(s"step_${i + 1}_ts"))) :+
      nCompleted.cast("int").as("steps_completed"): _*)
  }
}
