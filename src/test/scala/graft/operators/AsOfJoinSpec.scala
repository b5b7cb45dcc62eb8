package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("attaches the single most recent right row, atomically (null payload fields included)") {
    val left = Seq((1L, 30L, 100L)).toDF("k", "t", "lid")
    // newest right row has a NULL payload field — output must NOT fall back
    // to the older row's value for that field
    val right = Seq(
      (1L, 10L, 10L, Some(5.0)),
      (1L, 20L, 11L, None: Option[Double]))
      .toDF("k", "t", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "lid",
      Seq("rid", "rv"), "rid")
      .select("lid", "rid", "rv").collect()(0)
    assert(out.getLong(1) == 11L)
    assert(out.isNullAt(2), s"expected NULL rv from the rid=11 row, got $out")
  }

  test("inclusive semantics: right row at the same timestamp is visible") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L, 1.0)).toDF("k", "t", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "lid", Seq("rid"), "rid")
      .select("rid").as[Long].collect()
    assert(out.toSeq == Seq(7L))
  }

  test("left rows with no prior right row get a null payload") {
    val left = Seq((1L, 5L, 100L), (2L, 50L, 200L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L, 1.0)).toDF("k", "t", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "lid", Seq("rid"), "rid")
      .select("lid", "rid").collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(100L -> true, 200L -> true)) // t=5 precedes; key 2 has no rights
  }

  test("ties among same-timestamp right rows break on tieBreak (last wins)") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L, 1.0), (1L, 10L, 9L, 2.0)).toDF("k", "t", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "lid", Seq("rid", "rv"), "rid")
      .select("rid", "rv").as[(Long, Double)].collect()(0)
    assert(out == (9L, 2.0))
  }

  test("property: agrees with brute force on random data incl. null payloads across partitions") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small key/time domains force collisions, ties, and no-match cases;
    // ~40% of right payload values are null
    val leftGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
    } yield (k, t)))
    val rightGen = Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
      v <- Gen.frequency(3 -> Gen.choose(0.0, 9.0).map(Some(_)), 2 -> Gen.const(None))
    } yield (k, t, v)))
    for (seed <- 1 to 25) {
      val lRows = leftGen.pureApply(Gen.Parameters.default, Seed(seed))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rRows = rightGen.pureApply(Gen.Parameters.default, Seed(5000L + seed))
        .zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      // repartition both sides so right rows (null payloads included) are
      // scattered across input partitions — the union/window must reorder
      val left = lRows.toDF("k", "t", "lid").repartition(4)
      val right = rRows.toDF("k", "t", "rid", "rv").repartition(3)
      val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "lid", Seq("rid", "rv"), "rid")
        .select("lid", "rid", "rv").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      // brute force: newest right row (ts, then tieBreak) with rt <= lt,
      // its rv taken verbatim (may itself be null)
      val want = lRows.map { case (k, t, lid) =>
        rRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption match {
          case Some((_, _, rid, rv)) => (lid, Some(rid), rv)
          case None => (lid, None, None)
        }
      }.toSet
      assert(got == want, s"seed $seed diverged from brute force")
    }
  }

  test("property: forward direction + tolerance agree with brute force") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val leftGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
    } yield (k, t)))
    val rightGen = Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 9L)
      v <- Gen.frequency(3 -> Gen.choose(0.0, 9.0).map(Some(_)), 2 -> Gen.const(None))
    } yield (k, t, v)))
    for (seed <- 1 to 25) {
      val lRows = leftGen.pureApply(Gen.Parameters.default, Seed(100L + seed))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rRows = rightGen.pureApply(Gen.Parameters.default, Seed(7000L + seed))
        .zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val tol = (seed % 4).toLong // 0 (exact-ts only) through 3
      val left = lRows.toDF("k", "t", "lid").repartition(4)
      val right = rRows.toDF("k", "t", "rid", "rv").repartition(3)
      val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "lid", Seq("rid", "rv"),
        "rid", direction = "forward", toleranceMicros = Some(tol))
        .select("lid", "rid", "rv").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      // brute force: EARLIEST right row with rt >= lt (ties: largest rid),
      // discarded — not replaced — if beyond the tolerance
      val want = lRows.map { case (k, t, lid) =>
        rRows.filter(r => r._1 == k && r._2 >= t)
          .sortBy(r => (r._2, -r._3)).headOption match {
          case Some((_, rt, rid, rv)) if rt - t <= tol => (lid, Some(rid), rv)
          case _ => (lid, None, None)
        }
      }.toSet
      assert(got == want, s"seed $seed (tol $tol) diverged from brute force")
    }
  }

  test("backward tolerance discards stale matches instead of falling back") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    // nearest prior is at t=4 (distance 6); an older one at t=9? no —
    // make nearest t=4 and tolerance 3: match discarded, NOT the t=1 row
    val right = Seq((1L, 1L, 7L, Some(1.0)), (1L, 4L, 8L, Some(2.0)))
      .toDF("k", "t", "rid", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "lid", Seq("rid", "rv"),
      "rid", toleranceMicros = Some(3L))
      .select("rid").collect()
    assert(out.length == 1 && out(0).isNullAt(0),
      "stale nearest match must null the payload, not fall back to older rows")
  }
}
