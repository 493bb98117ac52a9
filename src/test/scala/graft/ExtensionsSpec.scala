package graft

/** The custom expressions registered through SparkSessionExtensions
  * (`graft.GraftExtensions`, loaded by the fixture via
  * `spark.sql.extensions`) must be reachable from plain SQL. */
class ExtensionsSpec extends GraftSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("dtw_distance is callable from SQL with a literal band") {
    val d = spark.sql(
      """SELECT dtw_distance(array(1.0D, 2.0D, 3.0D, 4.0D),
        |                    array(0.0D, 1.0D, 2.0D, 3.0D), 3) AS d""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(d - math.sqrt(2.0)) < 1e-12, s"got $d")
  }

  test("dtw_distance accepts a BIGINT band literal and rejects non-literals clearly") {
    // parser types CAST(3 AS BIGINT) as a boxed Long — must not ClassCastException
    val d = spark.sql(
      """SELECT dtw_distance(array(1.0D, 2.0D, 3.0D, 4.0D),
        |                    array(0.0D, 1.0D, 2.0D, 3.0D), CAST(3 AS BIGINT)) AS d""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(d - math.sqrt(2.0)) < 1e-12, s"got $d")

    // a non-foldable band must fail with the documented message, not an NPE
    val ex = intercept[Throwable] {
      spark.sql(
        "SELECT dtw_distance(array(1.0D), array(1.0D), id) FROM range(3)").collect()
    }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("band must be a literal int"), s"got: $messages")
  }

  test("dtw_distance widens float arrays and rejects non-array inputs at analysis") {
    // array<float> is implicitly cast to array<double> — same result as doubles
    val d = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(graft.functions.DtwDistance.dtw(col("a"), col("b"), 2).as("d"))
      .head().getDouble(0)
    assert(d == 0.0, s"got $d")

    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dtw_distance(1.0D, 2.0D, 1)").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("dtw_distance"), ex.getMessage)
  }

  test("vector_dot is callable from SQL") {
    val v = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(v == 32.0)
  }

  test("vector_dot handles mismatched lengths by truncating (documented)") {
    val v = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D)) AS d").head().getDouble(0)
    assert(v == 3.0)
  }

  test("vector_dot of literal arrays constant-folds at optimization time") {
    val df = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d FROM range(1)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("11.0"), s"expected folded literal 11.0 in:\n$optimized")
  }

  test("simhash_agg is callable from SQL and takes the per-bit majority") {
    // 3 hashes: bits where >=2 of {1,3,2} agree → (1&3)|(1&2)|(3&2) = 3
    val v = spark.sql(
      "SELECT simhash_agg(h) AS s FROM VALUES (1L), (3L), (2L) AS t(h)")
      .head().getLong(0)
    assert(v == 3L, s"majority of {01,11,10} per bit is 11, got $v")
  }

  test("top_k_by_score is callable from SQL as a grouped aggregate") {
    Seq((1L, 1.0), (2L, 3.0), (3L, 2.0), (4L, 5.0))
      .toDF("id", "score").createOrReplaceTempView("tk_fixture")
    val rows = spark.sql(
      """SELECT t.id, t.rnk FROM (
        |  SELECT top_k_by_score(score, id, 2) AS top FROM tk_fixture
        |) LATERAL VIEW explode(top) AS t
        |ORDER BY t.rnk""".stripMargin).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((4L, 1), (2L, 2)))
  }
}
