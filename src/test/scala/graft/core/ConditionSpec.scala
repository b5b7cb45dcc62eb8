package graft.core

import graft.TestSpark

import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

class ConditionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq(
      (1L, "a", 10.0, Seq("x", "y")),
      (2L, "b", 20.0, Seq("y")),
      (3L, "c", 30.0, Seq.empty[String]),
      (4L, null.asInstanceOf[String], 40.0, Seq("x")))
      .toDF("t__id", "t__name", "t__score", "t__tags")
  }

  private def eval(c: Condition): Seq[Long] =
    df.filter(c.toColumn((t, cc) => col(s"${t}__$cc")))
      .select("t__id").collect().map(_.getLong(0)).toSeq.sorted

  test("comparison atoms") {
    assert(eval(Condition("t.score", ">", 15.0)) == Seq(2L, 3L, 4L))
    assert(eval(Condition("t.score", "<=", 20.0)) == Seq(1L, 2L))
    assert(eval(Condition("t.name", "=", "b")) == Seq(2L))
    assert(eval(Condition("t.name", "!=", "b")) == Seq(1L, 3L))
  }

  test("IN requires a sequence literal and matches membership") {
    assert(eval(Condition("t.name", "IN", Seq("a", "c"))) == Seq(1L, 3L))
    assertThrows[IllegalArgumentException] {
      eval(Condition("t.name", "IN", "a"))
    }
  }

  test("CONTAINS is array membership (reference: commands.py:73-74)") {
    assert(eval(Condition("t.tags", "CONTAINS", "x")) == Seq(1L, 4L))
  }

  test("combinators & | ! compose with three-valued null semantics") {
    val c = (Condition("t.score", ">", 15.0) & Condition("t.score", "<", 35.0)) |
      Condition("t.name", "=", "a")
    assert(eval(c) == Seq(1L, 2L, 3L))
    // NOT(name = 'b'): null name row is filtered out (null-rejecting, like
    // the reference's comparisons, commands.py:125-139)
    assert(eval(!Condition("t.name", "=", "b")) == Seq(1L, 3L))
  }

  test("string 'table.column' parses as column ref; others are literals") {
    assert(Condition.operand("t.score") == Condition.ColRef("t", "score"))
    assert(Condition.operand("no dot here") == Condition.Lit("no dot here"))
    assert(Condition.operand(3.5) == Condition.Lit(3.5))
  }

  test("unknown operator rejected at construction") {
    assertThrows[IllegalArgumentException](Condition("t.a", "LIKE", "x"))
  }
}
