package graft

import org.apache.spark.sql.SparkSession

/** Plan/latency probe: `graft.Explain <sfDir> <queryName> [queryName ...]`
  * prints the formatted physical plan and two timed runs (cold + warm) for
  * each named query — the iterate-on-`.explain` loop SURVEY.md §7 calls for.
  * Pass no names to list available queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Spark 4 session-artifact isolation installs an ExecutorClassLoader
      // that resolves classes over the driver RPC file server; in long
      // multi-query sessions the per-task class probes dominate (measured
      // 60-90s/query late in bench runs). No artifacts are used — disable.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.optimizer.excludedRules", GraftExtensions.ExcludedOptimizerRules)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (names.isEmpty) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
    } else names.foreach { name =>
      // time CONSTRUCTION + count, not count alone: iterative operators
      // (connected components, k-means) run eager driver loops while the
      // DataFrame is being built — count-only timing hid 95% of
      // neardup_clusters' cost in round 3
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      println(s"===== $name =====")
      df.explain("formatted")
      val n = df.count()
      println(f"rows=$n build=$tBuild%.2fs cold=${(System.nanoTime() - t0) / 1e9}%.2fs (incl build)")
      val t1 = System.nanoTime()
      df.count()
      println(f"warm=${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
