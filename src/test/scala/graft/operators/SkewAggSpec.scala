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

  test("skewReport: top-N keys ranked with exact ppm shares and cumulative share") {
    // 10 "x", 6 "y", 3 "z", 1 "w" → 20 rows total
    val df = (Seq.fill(10)("x") ++ Seq.fill(6)("y") ++ Seq.fill(3)("z") ++ Seq("w"))
      .toDF("k")
    val got = SkewAgg.skewReport(df, col("k"), topN = 3)
      .select("rank", "key", "n", "share_ppm", "cum_share_ppm", "n_keys")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

    assert(got === Seq(
      (1L, "x", 10L, 500000L, 500000L, 4L),
      (2L, "y", 6L, 300000L, 800000L, 4L),
      (3L, "z", 3L, 150000L, 950000L, 4L)))
  }

  test("skewReport: count ties break on ascending key; topN caps the output") {
    val df = Seq("b", "b", "a", "a", "c").toDF("k")
    val got = SkewAgg.skewReport(df, col("k"), topN = 2)
      .select("rank", "key", "n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "a", 2L), (2L, "b", 2L)))
    assertThrows[IllegalArgumentException](SkewAgg.skewReport(df, col("k"), topN = 0))
  }
}
