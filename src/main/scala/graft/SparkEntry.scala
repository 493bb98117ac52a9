package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, CboStats, Curation, DataPrep, Dedup, Layout,
  Modern, Multimodal, PiiScrub, Pipeline, QualityFilters, Reference, Relational,
  RelationalExt, RelationalMore, Similarity, SourcesSinks, StandingIndex,
  SubstringDedup, TextAnalysis, TimeWindows, TpchFull, TypedOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family lives in its own module; this object only
  * aggregates the (name → query, name → oracle SQL) maps the driver
  * harness consumes (`Verify.scala`, `Bench.scala`).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole pipeline as one batch query (SURVEY.md §7). */
  def entry(spark: SparkSession): DataFrame =
    Reference.topTokens(spark, "/root/testdata/sf0.001")

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Reference.queries, Reference.oracles),
      (Analytics.queries, Analytics.oracles),
      (Layout.queries, Layout.oracles),
      (TimeWindows.queries, TimeWindows.oracles),
      (Relational.queries, Relational.oracles),
      (RelationalExt.queries, RelationalExt.oracles),
      (RelationalMore.queries, RelationalMore.oracles),
      (Modern.queries, Modern.oracles),
      (TpchFull.queries, TpchFull.oracles),
      (DataPrep.queries, DataPrep.oracles),
      (QualityFilters.queries, QualityFilters.oracles),
      (PiiScrub.queries, PiiScrub.oracles),
      (Pipeline.queries, Pipeline.oracles),
      (Dedup.queries, Dedup.oracles),
      (SubstringDedup.queries, SubstringDedup.oracles),
      (StandingIndex.queries, StandingIndex.oracles),
      (TextAnalysis.queries, TextAnalysis.oracles),
      (Similarity.queries, Similarity.oracles),
      (Multimodal.queries, Multimodal.oracles),
      (TypedOps.queries, TypedOps.oracles),
      (SourcesSinks.queries, SourcesSinks.oracles),
      (CboStats.queries, CboStats.oracles),
      (Curation.queries, Curation.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketches, LSH) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
