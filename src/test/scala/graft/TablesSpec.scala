package graft

import org.apache.spark.sql.types.TimestampType

/** Schema tripwire: if the driver regenerates testdata with different
  * columns, fail here with a clear message instead of deep inside a query. */
class TablesSpec extends GraftSpec {

  test("every table has exactly the expected columns") {
    Tables.expectedColumns.foreach { case (name, cols) =>
      val actual = Tables.table(spark, sf0001, name).columns.toSeq
      assert(actual == cols, s"$name: $actual != $cols")
    }
  }

  test("events loader yields a true TimestampType ts at microsecond precision") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.filter(org.apache.spark.sql.functions.col("ts").isNull).count() == 0)
  }
}
