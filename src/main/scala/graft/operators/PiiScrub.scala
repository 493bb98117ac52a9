package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction over `documents` — the privacy-scrub stage
  * every production LLM-training pipeline runs between dedup and
  * tokenization (SURVEY.md §2c extension scope; reference analogue:
  * ABSENT — the reference streams raw tweets with no scrubbing at all).
  *
  * Spark-first shape: detection and redaction are plain `regexp_count` /
  * `regexp_replace` column expressions — per-row, narrow, fully inside
  * whole-stage codegen; the ONLY shuffle in the stats query is the final
  * tiny per-language aggregate. At 100 TB this is the ideal operator
  * class: embarrassingly parallel over row-groups, no data movement, and
  * the regexes below are RE2-compatible (no backreferences, no
  * lookaround) so the same patterns run unchanged on any engine in the
  * fleet — which is exactly how the DuckDB oracle hash-gates the
  * redacted TEXT itself, not just match counts.
  *
  * The harness corpus is synthetic word-soup with no natural PII, so the
  * queries first lay deterministic pseudo-PII over it ([[augmented]] —
  * doc_id-derived emails / IPv4s / phone numbers on two thirds of the
  * docs, the remaining third left untouched as the negative path). The
  * augmentation is the TEST FIXTURE, mirrored expression-for-expression
  * in the oracle SQL; the operators themselves ([[emailCount]] /
  * [[scrub]] / …) are generic `Column → Column` functions a user points
  * at any string column.
  */
object PiiScrub {

  // ---------------------------------------------------------- the patterns
  // RE2-safe (linear-time, DuckDB/Go/Rust-compatible): character classes +
  // bounded quantifiers only — no backreferences, no lookaround. `\d` is
  // ASCII in both Java (default, no UNICODE_CHARACTER_CLASS) and RE2.
  //
  // Engine caveat: Spark executes these on java.util.regex, which
  // BACKTRACKS — EmailRe's `[A-Za-z0-9.-]+\.` can retry split points and
  // degrade to ~O(n²) on adversarial non-matching runs ('a@' + 'a'×10⁶),
  // where RE2 stays linear. Possessive quantifiers would fix Java but
  // don't exist in RE2, so the shared-pattern contract keeps the plain
  // form; a corpus exposed to adversarial text should route the scrub
  // through a linear-time engine (e.g. re2j) in a mapPartitions — same
  // patterns, same results, linear worst case.
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // Octets constrained to 0-255 via RE2-safe alternation (no lookaround):
  // the loose \d{1,3} form redacted non-addresses like 999.999.999.999
  // (ADVICE round 9). Still leftmost-match: a 5-octet run "1.2.3.4.5"
  // redacts its first 4 octets — pinned in PiiScrubSpec; both engines
  // agree because RE2 and java.util.regex share leftmost semantics here.
  private val Octet    = "(25[0-5]|2[0-4]\\d|1?\\d?\\d)"
  val Ipv4Re: String  = s"\\b($Octet\\.){3}$Octet\\b"
  val PhoneRe: String = "\\b\\d{3}-\\d{4}\\b"

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column  = regexp_count(c, lit(Ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))

  /** Redact all three PII classes with typed placeholders. Order is
    * email → IPv4 → phone (emails contain dots + digits that could
    * otherwise collide with the later numeric patterns); the pass is
    * idempotent — no placeholder matches any pattern. */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  // ------------------------------------------------------------ the fixture
  /** Deterministic pseudo-PII overlay: doc_id ≡ 1 (mod 3) gains an email,
    * doc_id ≡ 2 (mod 3) gains an IPv4 + phone, doc_id ≡ 0 (mod 3) is
    * untouched (negative path — the scrub must prove it changes nothing).
    * Pure doc_id arithmetic: identical rows in Spark and DuckDB. */
  private[operators] def augmented(docs: DataFrame): DataFrame =
    docs.withColumn("aug",
      when(pmod(col("doc_id"), lit(3)) === 1,
        concat(col("text"), lit(" contact u"), col("doc_id").cast("string"),
          lit("@ex"), pmod(col("doc_id"), lit(7)).cast("string"), lit(".org")))
      .when(pmod(col("doc_id"), lit(3)) === 2,
        concat(col("text"), lit(" from 10."), pmod(col("doc_id"), lit(250)).cast("string"),
          lit(".3."), pmod(col("doc_id"), lit(100)).cast("string"),
          lit(" call 555-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      .otherwise(col("text")))

  private val augSqlExpr: String =
    // NB stripMargin: a continuation line must never START with `||` —
    // the margin strip eats one pipe and leaves a bitwise-or
    """CASE doc_id % 3
      |    WHEN 1 THEN text || ' contact u' || doc_id::VARCHAR || '@ex' ||
      |                (doc_id % 7)::VARCHAR || '.org'
      |    WHEN 2 THEN text || ' from 10.' || (doc_id % 250)::VARCHAR || '.3.' ||
      |                (doc_id % 100)::VARCHAR || ' call 555-' ||
      |                lpad((doc_id % 10000)::VARCHAR, 4, '0')
      |    ELSE text END""".stripMargin

  // ------------------------------------------------------------- the queries
  /** Per-language PII census + redaction audit: match counts per class,
    * docs carrying any PII, and the total characters removed by the scrub
    * (length delta) — the last column pins the exact REPLACEMENT extents,
    * not merely that counts agree. One narrow projection + one tiny agg. */
  def scrubStats(s: SparkSession, dir: String): DataFrame = {
    val d = augmented(Tables.documents(s, dir))
      .select(col("lang"), col("aug"),
        emailCount(col("aug")).as("ne"),
        ipv4Count(col("aug")).as("ni"),
        phoneCount(col("aug")).as("np"),
        (length(col("aug")) - length(scrub(col("aug")))).as("delta"))
    d.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("ne") + col("ni") + col("np") > 0, 1L).otherwise(0L)).as("docs_with_pii"),
        sum(col("ne")).cast("long").as("n_emails"),
        sum(col("ni")).cast("long").as("n_ipv4"),
        sum(col("np")).cast("long").as("n_phones"),
        sum(col("delta")).cast("long").as("chars_removed"))
      .orderBy("lang")
  }

  val scrubStatsSql: String =
    s"""WITH aug AS (SELECT lang, $augSqlExpr AS aug FROM documents),
      |m AS (
      |  SELECT lang, aug,
      |         len(regexp_extract_all(aug, '$EmailRe')) AS ne,
      |         len(regexp_extract_all(aug, '$Ipv4Re'))  AS ni,
      |         len(regexp_extract_all(aug, '$PhoneRe')) AS np,
      |         length(aug)
      |           - length(regexp_replace(regexp_replace(regexp_replace(aug,
      |               '$EmailRe', '<EMAIL>', 'g'),
      |               '$Ipv4Re',  '<IP>',    'g'),
      |               '$PhoneRe', '<PHONE>', 'g')) AS delta
      |  FROM aug)
      |SELECT lang, count(*) AS n_docs,
      |       sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_pii,
      |       sum(ne)::BIGINT AS n_emails, sum(ni)::BIGINT AS n_ipv4,
      |       sum(np)::BIGINT AS n_phones, sum(delta)::BIGINT AS chars_removed
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-document redaction proof: the md5 of every scrubbed document,
    * hash-compared cross-engine — any divergence in match extents,
    * replacement order, or idempotency shows up as a digest mismatch on
    * the exact doc_id. Pure narrow projection (no shuffle but the
    * driver-contract ORDER BY). */
  def redactedDocs(s: SparkSession, dir: String): DataFrame =
    augmented(Tables.documents(s, dir))
      .select(col("doc_id"),
        emailCount(col("aug")).as("n_emails"),
        ipv4Count(col("aug")).as("n_ipv4"),
        phoneCount(col("aug")).as("n_phones"),
        md5(scrub(col("aug"))).as("scrub_md5"))
      .orderBy("doc_id")

  val redactedDocsSql: String =
    s"""WITH aug AS (SELECT doc_id, $augSqlExpr AS aug FROM documents)
      |SELECT doc_id,
      |       len(regexp_extract_all(aug, '$EmailRe'))::INT AS n_emails,
      |       len(regexp_extract_all(aug, '$Ipv4Re'))::INT  AS n_ipv4,
      |       len(regexp_extract_all(aug, '$PhoneRe'))::INT AS n_phones,
      |       md5(regexp_replace(regexp_replace(regexp_replace(aug,
      |           '$EmailRe', '<EMAIL>', 'g'),
      |           '$Ipv4Re',  '<IP>',    'g'),
      |           '$PhoneRe', '<PHONE>', 'g')) AS scrub_md5
      |FROM aug ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pii_scrub_stats"   -> (scrubStats _),
    "pii_redacted_docs" -> (redactedDocs _)
  )

  def oracles: Map[String, String] = Map(
    "pii_scrub_stats"   -> scrubStatsSql,
    "pii_redacted_docs" -> redactedDocsSql
  )
}
