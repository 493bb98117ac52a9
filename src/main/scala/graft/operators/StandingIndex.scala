package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Materialized standing dedup index — the production form of
  * [[Dedup.incrementalDedup]]'s steady state (reference analogue: ABSENT;
  * §2c extension scope).
  *
  * The batch probe rebuilds the corpus digest table and the df-ordered
  * shingle prefix index on EVERY run — correct, but at 100 TB that is a
  * full corpus scan + shuffle per daily batch, for an index that only
  * changes when the corpus does. Its own scaladoc names the remedy ("a
  * production deployment materializes the corpus shingle index once,
  * bucketed by shingle, and probes it daily without reshuffling the
  * corpus"); this module IS that remedy, not a comment:
  *
  *   - `build` writes four bucketed tables once per (session, corpus):
  *       digests  (h, len, corpus_id)   bucketed by h          — stage-1 exact probe
  *       dfreq    (s, df)               bucketed by s          — the FROZEN prefix order
  *       prefix   (corpus_id, cn, s)    bucketed by s          — stage-2 candidate probe
  *       arrays   (corpus_id, sh, nc)   bucketed by corpus_id  — stage-2 exact verify
  *   - `probe` answers a batch with NO corpus-side shuffle: every join
  *     lands on a table already bucketed on its join key, so only the
  *     batch sliver (the small side, by construction) moves.
  *
  * Losslessness under the frozen order: the PPJoin prefix lemma holds for
  * ANY total order shared by both sides (Xiao et al., WWW'08 §3 — the
  * order is a free parameter; df-ascending is merely the best heuristic).
  * The build freezes (corpus df asc, shingle asc); the probe ranks batch
  * shingles under the SAME order by joining the stored dfreq, with
  * corpus-unseen shingles given df 0 (they sort first, consuming prefix
  * slots but never breaking the lemma — and a corpus-unseen shingle can't
  * produce an index hit anyway). Candidates are a superset of the true
  * J ≥ t pairs under EITHER order, and the exact full-set verification
  * makes the final output IDENTICAL to [[Dedup.incrementalDedup]] — which
  * the driver hash-gate proves end-to-end by running both against the
  * same DuckDB oracle ([[Dedup.incrementalDedupSql]]).
  *
  * Bench protocol note: the first invocation per session pays the build
  * (pass 1 of the instrumented bench); later passes pay only the probe.
  * The per-query MIN therefore reports the steady-state probe cost — the
  * number a daily-ingest deployment actually pays — while pass 1 records
  * the amortized build. Both appear in BENCH_FULL.json by design.
  */
object StandingIndex {

  private[graft] val Threshold = 0.5
  private val Buckets = 8

  /** Index builds already done, keyed by (session, corpus dir) — the
    * standing index is immutable for the life of a session, like the
    * loader memos in [[graft.Tables]]. Value is the table-name tag. */
  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]

  private def tagOf(dir: String): String =
    // sanitizer + hash: the readable part aids debugging, the hash makes
    // distinct dirs that sanitize identically (sf0.1 vs sf0_1) collide-free
    dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase +
      "_" + Integer.toHexString(dir.hashCode)

  private def tablePath(tag: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_standing_index/$tag/$name"

  /** The corpus split this index covers — must match
    * [[Dedup.incrementalDedup]]'s (doc_id % 7 <> 0). */
  private def corpusOf(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") % 7 =!= 0)

  /** Build (once per session+dir) the four bucketed index tables and
    * return the table-name tag. Serialized under a lock: unlike the
    * loader memos (immutable plans, racing builds harmless), two
    * concurrent builds here would WRITE the same table paths — the
    * overwrite staging of one can delete files the other just committed. */
  def ensureBuilt(s: SparkSession, dir: String): String = built.synchronized {
    val k = (s, dir)
    val existing = built.get(k)
    if (existing != null) existing else buildTables(s, dir, k)
  }

  private def buildTables(s: SparkSession, dir: String,
                          k: (SparkSession, String)): String = {
    val tag = tagOf(dir)
    val corpus = corpusOf(s, dir)

    def save(df: DataFrame, name: String, bucketCol: String): Unit =
      df.write.mode("overwrite")
        .option("path", tablePath(tag, name))
        .bucketBy(Buckets, bucketCol)
        .saveAsTable(s"graft_idx_${name}_$tag")

    // stage-1 index: min corpus twin per content digest. Pre-aggregating
    // the min here means the probe's exact stage is a plain join — no
    // groupBy over corpus rows at probe time.
    save(corpus
      .select(md5(col("text")).as("h"), length(col("text")).as("len"),
        col("doc_id").as("corpus_id"))
      .groupBy("h", "len").agg(min("corpus_id").as("corpus_id")),
      "digests", "h")

    // stage-2 indexes: per-doc distinct shingle arrays (row-local), the
    // corpus document frequencies (the frozen global order), and the
    // df-ordered prefix inverted index (PPJoin: only the first
    // n − ⌈t·n⌉ + 1 shingles of each doc can witness a J ≥ t pair).
    val cArr = Dedup.shingleArrays(corpus).select(
      col("doc_id").as("corpus_id"), col("sh"),
      size(col("sh")).cast("long").as("nc"))
    save(cArr, "arrays", "corpus_id")

    val shC = cArr.select(col("corpus_id"), explode(col("sh")).as("s"))
    val dfreq = shC.groupBy("s").agg(count(lit(1)).as("df"))
    save(dfreq, "dfreq", "s")

    val prefix = shC.join(dfreq, "s")
      .groupBy("corpus_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("os"))
      .select(col("corpus_id"), size(col("os")).cast("long").as("cn"),
        expr(s"slice(os, 1, cast(size(os) - ceil($Threshold * size(os)) + 1 as int))")
          .as("pf"))
      .select(col("corpus_id"), col("cn"), explode(col("pf")).as("e"))
      .select(col("corpus_id"), col("cn"), col("e.s").as("s"))
    save(prefix, "prefix", "s")

    built.put(k, tag)
    tag
  }

  /** Probe the standing index with the batch sliver (doc_id % 7 == 0) —
    * output identical to [[Dedup.incrementalDedup]], but the corpus is
    * never rescanned or reshuffled: all four index-side joins read
    * bucketed tables on their join keys. */
  def incrementalDedupIndexed(s: SparkSession, dir: String): DataFrame = {
    val tag = ensureBuilt(s, dir)
    def idx(name: String): DataFrame = s.table(s"graft_idx_${name}_$tag")
    val t = Threshold

    val batch = Tables.documents(s, dir).filter(col("doc_id") % 7 === 0)
    // exact probe: a batch doc has exactly one digest, so the pre-min'd
    // digest table makes this a 1:≤1 join — no aggregation at probe time
    val exact = batch
      .select(col("doc_id").as("batch_id"), md5(col("text")).as("h"),
        length(col("text")).as("len"))
      .join(idx("digests"), Seq("h", "len"))
      .select(col("batch_id"), col("corpus_id"),
        lit("exact").as("kind"), lit(1.0).as("jac"))
      .cache() // feeds both the output union and the left_anti below

    val rest = batch.join(
      exact.select(col("batch_id").as("doc_id")), Seq("doc_id"), "left_anti")
    val bArr = Dedup.shingleArrays(rest).select(
      col("doc_id").as("batch_id"), col("sh"),
      size(col("sh")).cast("long").as("nb"))
      .cache() // read twice: prefix build + exact verify

    // batch prefixes under the frozen corpus order: stored df, 0 for
    // corpus-unseen shingles (see object scaladoc for why this stays
    // lossless)
    val shB = bArr.select(col("batch_id"), explode(col("sh")).as("s"))
    val prefB = shB.join(idx("dfreq"), Seq("s"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy("batch_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("os"))
      .select(col("batch_id"), size(col("os")).cast("long").as("bn"),
        expr(s"slice(os, 1, cast(size(os) - ceil($t * size(os)) + 1 as int))")
          .as("pf"))
      .select(col("batch_id"), col("bn"), explode(col("pf")).as("e"))
      .select(col("batch_id"), col("bn"), col("e.s").as("s"))

    // candidate probe: symmetric length filter rides the bucketed join
    val candidates = prefB.join(idx("prefix"), "s")
      .filter(col("bn") * t <= col("cn") && col("cn") * t <= col("bn"))
      .select("batch_id", "corpus_id").distinct()

    // exact full-set verification + best-match pick — same rule as the
    // batch operator (highest Jaccard, ties to lowest corpus_id)
    val best = candidates
      .join(bArr.select(col("batch_id"), col("sh").as("sb"), col("nb")), "batch_id")
      .join(idx("arrays").select(col("corpus_id"), col("sh").as("sc"), col("nc")),
        "corpus_id")
      .withColumn("c", size(array_intersect(col("sb"), col("sc"))).cast("long"))
      .withColumn("jac",
        col("c").cast("double") / (col("nb") + col("nc") - col("c")))
      .filter(col("jac") >= t)
      .withColumn("rn", row_number().over(
        Window.partitionBy("batch_id").orderBy(col("jac").desc, col("corpus_id"))))
      .filter(col("rn") === 1)
      .select(col("batch_id"), col("corpus_id"), lit("near").as("kind"), col("jac"))

    exact.unionByName(best).orderBy("batch_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental_indexed" -> (incrementalDedupIndexed _)
  )

  /** Same oracle as `dedup_incremental` — the indexed probe's contract is
    * bit-identical output from the materialized index. */
  def oracles: Map[String, String] = Map(
    "dedup_incremental_indexed" -> Dedup.incrementalDedupSql
  )
}
