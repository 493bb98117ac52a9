package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-robustness surfaces a production lake depends on: malformed-
  * record policies on semi-structured reads, and parquet schema
  * evolution across files written at different pipeline versions. */
class IngestRobustnessSpec extends GraftSpec {
  import spark.implicits._

  private val goodAndBad = Seq(
    """{"id": 1, "v": 10}""",
    """{"id": 2, "v": }""",   // malformed
    """{"id": 3, "v": 30}""")

  test("JSON malformed-record policies: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("_corrupt_record", StringType)))
    val ds = spark.createDataset(goodAndBad)

    // PERMISSIVE (default): poison rows become (null, null, raw-text) —
    // the quarantine column a pipeline routes to a dead-letter sink
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(ds)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(permissive.filter(col("id").isNotNull).count() == 2)

    // DROPMALFORMED: bad rows silently vanish — row counts shift, which
    // is why the pipeline default stays PERMISSIVE + quarantine
    val dropped = spark.read.schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(ds)
    assert(dropped.count() == 2)

    // FAILFAST: the strict gate for curated zones
    val strict = spark.read.schema(StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST").json(ds)
    intercept[org.apache.spark.SparkException] { strict.collect() }
  }

  test("parquet schema evolution: mergeSchema unions v1 and v2 file schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    // v1 writer: (id, a); v2 writer adds column b
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/p=1")
    Seq((2L, "y", 99L)).toDF("id", "a", "b").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "p"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // old files surface the new column as NULL — readers never break on
    // a writer upgrade
    assert(rows.sameElements(Array((1L, "x", -1L), (2L, "y", 99L))))
  }
}
