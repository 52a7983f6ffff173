package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

import graft.core.{Converters, DateSpan, Nm}
import graft.functions.{Dedup, Layout, Packing, Pii, Sampling, TextAnalysis, Vectors}
import graft.sources.Sources
import graft.tables._


/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 plus the training-data operators, each with a DuckDB-runnable
  * oracle in `oracleSql` where the semantics are SQL-expressible
  * (hash-seeded ops — minhash/simhash/sign-LSH — get a rows-only check and a
  * ScalaTest spec instead).
  */
object SparkEntry {

  /** see [[EntryShared.ReplayCache]] (consumed by graft.Bench) */
  def pinnedReplayRddIds: Set[Int] = EntryShared.ReplayCache.pinnedIds

  /** Per-query workload annotations emitted verbatim into the bench
    * artifact's `notes` section — a gate query whose benched workload
    * deliberately differs from the operator's full-corpus default must
    * say so IN the artifact, not only in code comments (round-14 ADVICE:
    * dedup_containment's half-sample made round-over-round timings
    * non-comparable with no marker in the artifact itself).
    */
  def benchNotes: Map[String, String] = Map(
    "dedup_containment" -> ("gate query runs the deterministic doc_id % 2 = 0 " +
      "half-sample since round 14 (operator stays full-corpus via the " +
      "graph_* consumers); timings before r14 are not comparable"))

  /** Query → shared-replay-family key, for every query whose monitor state
    * comes from [[ReplayCache]]. Bench packs its fresh-JVM slices
    * FAMILY-ATOMICALLY (a family never straddles a slice boundary; one
    * larger than the slice cap gets its own slice), so a family's readouts
    * land in ONE child and the state builds once per JVM; the slice layout
    * in the artifact records the grouping explicitly.
    */
  val benchFamilies: Map[String, String] = Map(
    "stream_anomaly" -> "vol", "stream_forecast" -> "vol",
    "stream_cusum" -> "vol", "stream_ewma" -> "vol",
    "stream_burstiness" -> "vol",
    "stream_mannkendall" -> "vol", "stream_acf" -> "vol",
    "stream_ljung_box" -> "vol", "stream_durbin_watson" -> "vol",
    "stream_wilcoxon" -> "vol", "stream_sign_test" -> "vol",
    "stream_friedman" -> "vol", "stream_page_trend" -> "vol",
    "stream_pettitt" -> "vol", "stream_holt" -> "vol",
    "stream_fdr" -> "vol", "stream_padjust" -> "vol",
    "stream_page_hinkley" -> "vol", "stream_mase" -> "vol",
    "stream_runs" -> "vol", "stream_pchart" -> "vol",
    "stream_mix_evenness" -> "vol", "stream_sprt" -> "prop",
    "stream_auc" -> "aucdocs", "stream_pr_curve" -> "aucdocs",
    "stream_reliability" -> "aucdocs",
    "stream_gains" -> "aucdocs", "stream_confusion" -> "aucdocs",
    "stream_mwu" -> "aucvalue", "stream_cliffs" -> "aucvalue",
    "stream_brunner_munzel" -> "aucvalue", "stream_ansari" -> "aucvalue",
    "stream_ks" -> "aucvalue", "stream_cvm" -> "aucvalue",
    "stream_ad" -> "aucvalue", "stream_wasserstein" -> "aucvalue",
    "stream_survival" -> "survival", "stream_hazard" -> "survival",
    "stream_survival_summary" -> "survival",
    "stream_corr" -> "corr", "stream_cuped" -> "corr",
    "stream_cov" -> "cov", "stream_cronbach" -> "cov",
    "stream_simpson" -> "keycount", "stream_cohenh" -> "prop",
    "stream_kruskal" -> "kruskal", "stream_jonckheere" -> "kruskal",
    "stream_mood_median" -> "kruskal", "stream_levene" -> "kruskal",
    "stream_quantile_exact" -> "kruskal",
    "stream_trimmed" -> "kruskal", "stream_mad" -> "kruskal",
    "stream_shape" -> "kruskal",
    "stream_key_skew" -> "keycount", "stream_gini" -> "keycount",
    "stream_hill" -> "keycount",
    "stream_retention" -> "retention", "stream_stickiness" -> "retention",
    "stream_kappa" -> "kappa", "stream_mcnemar" -> "kappa",
    "stream_gwet" -> "kappa",
    "stream_cochranq" -> "cochran", "stream_fleiss" -> "cochran",
    "stream_krippendorff" -> "cochran",
    "stream_twoprop" -> "prop", "stream_power" -> "prop",
    "stream_riskratio" -> "prop",
    "stream_welch" -> "welch", "stream_cohend" -> "welch",
    "stream_anova" -> "anova", "stream_tukey" -> "anova",
    "stream_bartlett" -> "anova",
    "stream_jarque_bera" -> "normality", "stream_grubbs" -> "normality",
    "stream_dagostino" -> "normality",
    "stream_mi" -> "mihr", "stream_theilu" -> "mihr")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("fact_load")(spark, "/root/testdata/sf0.001")

  // =================================================================
  // queries
  // =================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.m ++ QueriesTables.m ++
      QueriesTrainingA.m ++ QueriesTrainingB.m

  def oracleSql: Map[String, String] =
    OracleSqlA.m ++ OracleSqlB.m ++ OracleSqlC.m ++ OracleSqlD.m
}
