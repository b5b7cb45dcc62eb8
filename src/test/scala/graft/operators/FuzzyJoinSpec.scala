package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("selfJoin: finds substitution/insertion/equal pairs, kills transposition FPs") {
    val rows = Seq(
      (1L, "graft"),   // 1↔2 substitution (a→o)
      (2L, "groft"),
      (3L, "graf"),    // 3↔1 deletion; 3↔2 distance 2
      (4L, "ab"),      // 4↔5 transposition = distance 2: shares sig "a",
      (5L, "ba"),      //   the exact residual must kill it
      (6L, "ab"),      // 6↔4 equal strings
      (7L, "zzz"),     // no neighbor
      (8L, "")).toDF("id", "s") // empty string: no deletions, no crash
    val out = FuzzyJoin.selfJoin(rows, col("id"), col("s"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (1L, 3L), (4L, 6L)),
      s"expected {sub, del, equal} pairs only — got $out")
  }

  test("selfJoin: deterministic and antisymmetric (id_a < id_b always)") {
    val rows = Seq.tabulate(50)(i => (i.toLong, f"name#$i%03d")).toDF("id", "s")
    val out = FuzzyJoin.selfJoin(rows, col("id"), col("s"))
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.forall { case (a, b) => a < b })
    val again = FuzzyJoin.selfJoin(rows, col("id"), col("s"))
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // name#001..name#009 are all within one edit of name#000 etc.
    assert(out.nonEmpty)
  }
}
