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
}
