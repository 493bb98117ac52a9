package graft

import org.apache.spark.sql.SparkSession

/** Scale rehearsal: measure the multi-stage queries and their standing
  * builds across corpus scale factors, so the 100 TB posture rests on a
  * MEASURED scaling curve rather than plan-shape argument alone.
  *
  * Protocol (SCALE.md records the results):
  *  - corpora: the driver's sf0.1 plus `scripts/gen_scale_corpus.py`
  *    outputs (sf0.5 ≈ 5×, sf1 ≈ 10× the sf0.1 document/embedding rows,
  *    same vocabulary/length/near-dup distribution, so per-doc work is
  *    comparable across scale);
  *  - per corpus: time each standing-index build (dedup, leakage-audit,
  *    ANN-IVF, substring-gram — the once-per-corpus session setup), then
  *    each target query twice; the per-query MIN is the steady-state
  *    number (same attribution discipline as [[Bench]]);
  *  - targets: the five most composed document/embedding pipelines —
  *    dedup_incremental, entity_resolution, pipeline_training_set,
  *    split_leakage_audit, ann_ivf_indexed — exactly the queries whose
  *    scaling a quadratic candidate generator or an unbounded fixpoint
  *    would wreck first.
  *
  * Usage: ScaleBench <dir1> <dir2> ... (each dir holding
  * documents.parquet + embeddings.parquet). Prints one JSON line per
  * corpus with build and query seconds.
  */
object ScaleBench {
  private val Targets = Seq(
    "dedup_incremental", "entity_resolution", "pipeline_training_set",
    "split_leakage_audit", "ann_ivf_indexed",
    // round-13 widening: one representative per remaining scale-sensitive
    // family — banded-LSH near-dup (the dedup scale path), the standing
    // gram-index substring probe, the five-stage curation dataflow, and
    // embedding-space dedup (sign-grid cells + CC)
    "neardup_minhash_md5", "dedup_incremental_substring_indexed",
    "pipeline_curate", "semantic_dedup",
    // the ER capstone's banded scale twin — the pair SCALE.md's
    // exact-vs-LSH reading is about
    "entity_resolution_lsh")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleBench <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def r2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // JVM/codegen warmup, untimed (same rationale as Bench)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (dir <- args) {
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val builds = Seq(
        "build_dedup_idx" -> time(graft.operators.StandingIndex.ensureBuilt(spark, dir)),
        "build_audit_idx" -> time(graft.operators.StandingIndex.ensureAuditBuilt(spark, dir)),
        "build_ann_idx"   -> time(graft.operators.Similarity.ensureAnnIndex(spark, dir)),
        "build_gram_idx"  -> time(graft.operators.SubstringDedup.ensureGramIndex(spark, dir)))
      val queries = Targets.map { name =>
        val fn = SparkEntry.queries(name)
        val obs = (1 to 2).map { _ =>
          val t = time(fn(spark, dir).count())
          spark.catalog.clearCache()
          graft.operators.Ranks.releaseAll()
          t
        }
        System.gc()
        name -> obs
      }
      val json =
        s"""{"dir":"$dir","n_docs":$nDocs,""" +
        builds.map { case (k, v) => s""""$k":${r2(v)}""" }.mkString("", ",", ",") +
        queries.map { case (k, os) =>
          s""""$k":{"min":${r2(os.min)},"passes":[${os.map(r2).mkString(",")}]}"""
        }.mkString("", ",", "") + "}"
      println(json)
      System.out.flush()
    }
    spark.stop()
  }
}
