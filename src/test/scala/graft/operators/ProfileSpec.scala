package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counts, nulls, distincts, and typed min/max per column") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("a"))).toDF("num", "s")
    val rows = Profile.profile(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) -> r).toMap

    val n = rows("num")
    assert(n.getLong(1) == 4 && n.getLong(2) == 1) // n, n_null
    assert(n.getLong(3) == 2)                      // distinct {3,1}
    assert(n.getDouble(4) == 1.0 && n.getDouble(5) == 3.0)
    assert(n.isNullAt(6) && n.isNullAt(7))         // no string slots

    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("timestamp columns profile as epoch micros") {
    val df = Seq("2024-01-01 00:00:01", "2024-01-01 00:00:02")
      .toDF("raw").selectExpr("CAST(raw AS TIMESTAMP) AS ts")
    val r = Profile.profile(df, Seq("ts")).collect()(0)
    assert(r.getDouble(4) == 1.704067201e15 && r.getDouble(5) == 1.704067202e15)
  }

  test("all-null column: distinct 0, min/max null") {
    val df = Seq((1, None: Option[String]), (2, None)).toDF("i", "s")
    val r = Profile.profile(df, Seq("s")).collect()(0)
    assert(r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.isNullAt(6) && r.isNullAt(7))
  }

  test("single scan: exactly one aggregation over the input") {
    val df = Seq((1, "a"), (2, "b")).toDF("i", "s").repartition(2)
    val plan = Profile.profile(df, Seq("i", "s"))
      .queryExecution.optimizedPlan.toString
    // the multi-distinct rides ONE Expand — the input is not unioned
    // per-column
    assert(!plan.contains("Union"), plan)
  }

  test("histogram: counts per bucket, empty buckets zero-filled, hi clamps into last") {
    import org.apache.spark.sql.functions.col
    val df = Seq(0.0, 0.5, 0.9, 1.0, 3.9, 4.0, -1.0, 5.0).toDF("x")
    val rows = Profile.histogram(df, col("x"), 0.0, 4.0, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    // -1 and 5 out of range; 4.0 clamps into bucket 3
    assert(rows.toSeq == Seq(
      (0L, 0.0, 3L), (1L, 1.0, 1L), (2L, 2.0, 0L), (3L, 3.0, 2L)))
  }

  test("histogram: null values are ignored") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Some(1.0), None, Some(2.5)).toDF("x")
    val total = Profile.histogram(df, col("x"), 0.0, 4.0, 2)
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(total == 2)
  }

  test("unsupported column types are rejected loudly") {
    val df = Seq((1, Seq(1, 2))).toDF("i", "arr")
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("arr"))
    }
  }

  test("profileSketch: nulls skipped, exact below k, all-null column safe") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Some(1L), Some("a"), None: Option[String]),
      (Some(2L), Some("b"), None),
      (Some(1L), None, None),
      (None, Some("a"), None))
      .toDF("id", "s", "empty")
    val rows = Profile.profileSketch(df, Seq("id", "s", "empty"), k = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))).toMap
    // below k the estimate IS the exact distinct count of non-null values
    assert(rows("id") == ((4L, 1L, rows("id")._3, 2L)))
    assert(rows("s") == ((4L, 1L, rows("s")._3, 2L)))
    assert(rows("empty") == ((4L, 4L, None, 0L)),
      "all-null column: zero estimate, null threshold, no crash")
    assert(rows("id")._3.nonEmpty && rows("s")._3.nonEmpty)
    // deterministic: a second run returns the identical sketch outputs
    val again = Profile.profileSketch(df, Seq("id", "s", "empty"), k = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))).toMap
    assert(rows == again)
  }

  test("profileSketch: estimate within ~3/sqrt(k) of truth above k") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 5000L).map(i => Tuple1(i)).toDF("id")
    val est = Profile.profileSketch(df, Seq("id"), k = 64)
      .collect()(0).getLong(4)
    assert(math.abs(est - 5000L) < 5000 * 3.0 / math.sqrt(64),
      s"KMV estimate $est too far from 5000")
  }

  test("joinCardinalitySketch: exact below k, tracks the exact estimator above k") {
    import org.apache.spark.sql.functions.col
    // below k on both sides: the sketch IS the exact distinct count and
    // the estimate equals joinCardinalityEstimate's
    val a = Seq(1L, 1L, 2L, 3L).map(Tuple1(_)).toDF("ka")
    val b = Seq(2L, 3L, 3L).map(Tuple1(_)).toDF("kb")
    val sk = Profile.joinCardinalitySketch(a, col("ka"), b, col("kb"), k = 8)
      .collect()(0)
    val ex = Profile.joinCardinalityEstimate(a, col("ka"), b, col("kb"))
      .collect()(0)
    assert((sk.getLong(0), sk.getLong(1), sk.getLong(2), sk.getLong(3), sk.getLong(4)) ==
      ((ex.getLong(0), ex.getLong(1), ex.getLong(2), ex.getLong(3), ex.getLong(4))))
    // above k: estimate within the KMV error envelope of the exact one
    val big = (1L to 4000L).map(Tuple1(_)).toDF("ka")
    val est = Profile.joinCardinalitySketch(big, col("ka"), big, col("ka"), k = 64)
      .collect()(0)
    assert(math.abs(est.getLong(1) - 4000L) < 4000 * 3.0 / math.sqrt(64))
    assert(math.abs(est.getLong(4) - 4000L) < 4000 * 6.0 / math.sqrt(64),
      s"est_rows ${est.getLong(4)} too far from the self-join truth 4000")
  }
}
