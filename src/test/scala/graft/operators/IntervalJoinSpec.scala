package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference answer: brute-force cross join + exact range predicate. */
  private def naive(
      pts: Seq[Long], ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      p <- pts
      (id, s, e) <- ivs
      if p >= s && p < e
    } yield (p, id)).toSet

  private def run(
      pts: Seq[Long], ivs: Seq[(Long, Long, Long)], w: Long): Set[(Long, Long)] = {
    val points = pts.toDF("p")
    val intervals = ivs.toDF("iid", "s", "e")
    IntervalJoin.bucketed(points, intervals, "p", "s", "e", w)
      .select("p", "iid").as[(Long, Long)].collect().toSet
  }

  test("matches brute force on randomized data, several bucket widths") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)(rnd.nextLong() % 1000L) // negatives included
    val ivs = (1L to 60L).map { id =>
      val s = rnd.nextLong() % 1000L
      (id, s, s + rnd.nextInt(300).toLong) // zero-length intervals included
    }
    val expect = naive(pts, ivs)
    for (w <- Seq(1L, 7L, 100L, 1000L, 100000L))
      assert(run(pts, ivs, w) == expect, s"width=$w")
  }

  test("half-open bounds: start inclusive, end exclusive") {
    val got = run(Seq(10L, 19L, 20L), Seq((1L, 10L, 20L)), 5L)
    assert(got == Set((10L, 1L), (19L, 1L)))
  }

  test("empty interval (end <= start) matches nothing") {
    assert(run(Seq(10L), Seq((1L, 10L, 10L), (2L, 12L, 8L)), 4L).isEmpty)
  }

  test("each contained point appears exactly once even when the interval spans many buckets") {
    val points = Seq(42L).toDF("p")
    val intervals = Seq((1L, 0L, 1000L)).toDF("iid", "s", "e")
    val rows = IntervalJoin.bucketed(points, intervals, "p", "s", "e", 3L)
      .select("p", "iid").collect()
    assert(rows.length == 1)
  }

  test("negative coordinates bucket correctly (floored, not truncated)") {
    val got = run(Seq(-10L, -1L, 0L), Seq((1L, -10L, 0L)), 7L)
    assert(got == Set((-10L, 1L), (-1L, 1L)))
  }

  test("equi-keys restrict matches to the same key") {
    val points = Seq((5L, 1L), (5L, 2L)).toDF("p", "k")
    val intervals = Seq((10L, 0L, 100L, 1L)).toDF("iid", "s", "e", "k")
    val got = IntervalJoin.bucketed(points, intervals, "p", "s", "e", 8L, Seq("k"))
      .select("p", "k", "iid").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((5L, 1L, 10L)))
  }

  test("overlap matches brute force, each pair exactly once, several widths") {
    val rnd = new scala.util.Random(13)
    def ivs(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rnd.nextLong() % 500L
      (idBase + i, s, s + 1 + rnd.nextInt(200).toLong)
    }
    val ls = ivs(50, 1000L)
    val rs = ivs(60, 2000L)
    val want = (for {
      (lid, ls1, le) <- ls
      (rid, rs1, re) <- rs
      if ls1 < re && rs1 < le
    } yield (lid, rid)).toSet
    val lDf = ls.toDF("lid", "ls", "le")
    val rDf = rs.toDF("rid", "rs", "re")
    for (w <- Seq(1L, 9L, 64L, 1000L)) {
      val rows = IntervalJoin.overlap(lDf, rDf, "ls", "le", "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(rows.length == rows.toSet.size, s"duplicate pairs at width=$w")
      assert(rows.toSet == want, s"width=$w")
    }
  }

  test("overlap: touching intervals ([0,10) and [10,20)) do not overlap") {
    val l = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 10L, 20L), (3L, 9L, 11L)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlap(l, r, "ls", "le", "rs", "re", 4L)
      .select("rid").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("plan is an equi-join, not a nested loop") {
    val points = Seq(1L, 2L).toDF("p")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val plan = IntervalJoin.bucketed(points, intervals, "p", "s", "e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
