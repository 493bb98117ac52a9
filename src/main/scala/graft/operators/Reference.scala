package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity operators (SURVEY.md §2a).
  *
  * The reference (`tweet-streamer/src/main/scala/main.scala:41-55`) filters
  * English tweets, splits text on a single space, keeps `#`-prefixed tokens,
  * counts them over a sliding window, sorts descending and takes the top 10
  * plus a distinct count. Here each stage is a batch, oracle-checkable query
  * over the driver tables; the Structured Streaming twin lives in
  * `graft.streaming`.
  *
  * Scale notes: every query below is a scan → (narrow ops) → single
  * shuffle-agg → tiny ordered result. Token explode is map-side; the only
  * shuffles are the hash aggregations, which carry partial (map-side) combine
  * for free via Catalyst's partial+final HashAggregate split. At 100 TB the
  * top-k becomes `TakeOrderedAndProject` (no full sort materialization).
  */
object Reference {

  /** Tokenizer with the reference's exact semantics
    * (`main.scala:45`): split on single space, case-sensitive, no
    * punctuation stripping; empty tokens (from consecutive spaces) dropped.
    */
  def tokens(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")

  /** Flagship (F1+T1+O1+K1): top-10 tokens among English documents.
    * The synthetic corpus has no '#' tokens, so the un-prefixed token count
    * is the flagship; the hashtag-filter variant is covered in tests and the
    * streaming twin. */
  def topTokens(s: SparkSession, dir: String): DataFrame = {
    tokens(Tables.documents(s, dir).filter(col("lang") === "en"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(10)
  }

  val topTokensSql: String =
    """SELECT token, cnt FROM (
      |  SELECT t.token AS token, count(*) AS cnt
      |  FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
      |  WHERE d.lang = 'en' AND t.token <> ''
      |  GROUP BY 1
      |) ORDER BY cnt DESC, token LIMIT 10""".stripMargin

  /** A1: number of distinct tokens among English documents (the reference's
    * per-window `rdd.count()` on the distinct-tag stream, `main.scala:53`). */
  def distinctTokenCount(s: SparkSession, dir: String): DataFrame =
    tokens(Tables.documents(s, dir).filter(col("lang") === "en"))
      .agg(countDistinct(col("token")).as("distinct_tokens"))

  val distinctTokenCountSql: String =
    """SELECT count(DISTINCT t.token) AS distinct_tokens
      |FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
      |WHERE d.lang = 'en' AND t.token <> ''""".stripMargin

  /** F1: the language filter as a standalone scan+filter+project query.
    * Filter and column pruning reach the parquet scan (PushedFilters). */
  def filterEnglishDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("lang") === "en")
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")

  val filterEnglishDocsSql: String =
    "SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id"

  /** Per-language token counts — the reference pipeline generalized from the
    * lang='en' hardcode; exercises explode + two-key agg. */
  def tokensPerLang(s: SparkSession, dir: String): DataFrame =
    tokens(Tables.documents(s, dir))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("token")).as("n_distinct"))
      .orderBy("lang")

  val tokensPerLangSql: String =
    """SELECT d.lang AS lang, count(*) AS n_tokens, count(DISTINCT t.token) AS n_distinct
      |FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
      |WHERE t.token <> ''
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ref_top_tokens"      -> (topTokens _),
    "ref_distinct_tokens" -> (distinctTokenCount _),
    "ref_filter_english"  -> (filterEnglishDocs _),
    "ref_tokens_per_lang" -> (tokensPerLang _)
  )

  def oracles: Map[String, String] = Map(
    "ref_top_tokens"      -> topTokensSql,
    "ref_distinct_tokens" -> distinctTokenCountSql,
    "ref_filter_english"  -> filterEnglishDocsSql,
    "ref_tokens_per_lang" -> tokensPerLangSql
  )
}
