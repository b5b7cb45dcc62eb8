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

  test("selfJoin ≡ brute-force levenshtein ≤ 1, incl. repeated-char runs") {
    // "aab"/"abb" is the positional-prune trap: the substitution is at
    // position 2, but the shared deletion VALUE "ab" first occurs at
    // position 1 in "aab" and 2 in "abb" — a signature scheme that
    // deduped equal-valued deletions to one position would orphan this
    // true pair. Mixed in: runs, transpositions, sequential-id families.
    val strs = Seq(
      "aab", "abb", "aaab", "aaab", "abab", "baba", "aa", "aaa",
      "id0012", "id0021", "id0011", "id0013", "xyzzy", "xyzy", "") ++
      Seq.tabulate(30)(i => f"cust#${i * 7 % 100}%03d")
    val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = FuzzyJoin.selfJoin(rows, col("id"), col("s"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = rows.as("x").join(rows.as("y"),
        col("x.id") < col("y.id") &&
          levenshtein(col("x.s"), col("y.s")) <= 1)
      .select(col("x.id"), col("y.id")).as[(Long, Long)].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("selfJoinBlocked: matches only inside a block; equals the unblocked join filtered by block") {
    // ann/ana within one edit in both blocks; cross-block ann/ann must NOT pair
    val rows = Seq(
      (1L, "ann", 10L), (2L, "ana", 10L),
      (3L, "ann", 20L), (4L, "ana", 20L), (5L, "zzz", 20L)).toDF("id", "s", "blk")
    val got = FuzzyJoin.selfJoinBlocked(rows, col("id"), col("s"), col("blk"))
      .select("block", "id_a", "id_b").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 2L), (20L, 3L, 4L)))
    // parity contract: blocked output ≡ unblocked pairs whose endpoints
    // share the block (the recall trade is exactly the cross-block pairs)
    val blkOf = rows.select("id", "blk").as[(Long, Long)].collect().toMap
    val unblocked = FuzzyJoin.selfJoin(rows, col("id"), col("s"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sameBlock = unblocked.filter { case (a, b) => blkOf(a) == blkOf(b) }
      .map { case (a, b) => (blkOf(a), a, b) }
    assert(got == sameBlock)
    // a null block joins nothing (SQL equality semantics, filtered early)
    val withNull = Seq((1L, "ann", Some(10L)), (2L, "ana", Some(10L)),
      (6L, "ann", None: Option[Long])).toDF("id", "s", "blk")
    val nulled = FuzzyJoin.selfJoinBlocked(withNull, col("id"), col("s"), col("blk"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nulled == Set((1L, 2L)))
  }
}
