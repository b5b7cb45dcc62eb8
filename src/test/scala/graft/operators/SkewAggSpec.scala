package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SkewAgg two-stage distinct vs SQL COUNT(DISTINCT) GROUP BY semantics,
  * including both null axes (null values and null keys).
  */
class SkewAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("distinctAndTotals matches COUNT(DISTINCT) incl. null keys and null values") {
    val df = Seq(
      (Some("a"), Some(1L), 10.0),
      (Some("a"), Some(1L), 10.0),
      (Some("a"), Some(2L), 5.0),
      (Some("a"), None, 1.0), // null value: not counted as distinct
      (Some("b"), None, 2.0), // all-null values: n_distinct = 0
      (None, Some(7L), 3.0), // null KEY is a real SQL group
      (None, Some(8L), 4.0)
    ).toDF("k", "u", "v")

    val got = SkewAgg.distinctAndTotals(df, col("k"), col("v"), col("u"))
      .select("key", "n", "sum_value", "n_distinct")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

    assert(got === Set(
      (Some("a"), 4L, 26.0, 2L),
      (Some("b"), 1L, 2.0, 0L),
      (None, 2L, 7.0, 2L)))
  }
}
