package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic BPE worked example: low×5, lower×2, newest×6
  private def docs = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest")
  ).toDF("doc_id", "text")

  test("train learns merges by descending pair frequency with symbol-order tiebreak") {
    val merges = Bpe.train(docs, col("text"), numMerges = 3)
    // pair counts over word freqs {low:5, lower:2, newest:6}:
    //   (w,e) = 2+6 = 8 wins round 1
    //   (l,o) = 5+2 = 7 wins round 2
    //   round 3 ties at 6: (n,e),(e,we),(we,s),(s,t),(t,</w>) —
    //   (e,we) wins on left-symbol order
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("w", "e"), ("l", "o"), ("e", "we")))
    assert(merges.map(_.rank) == Seq(0, 1, 2))
  }

  test("train stops early when the best pair falls under minPairCount") {
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // pairs: (a,b)=2,(b,</w>)=2,(c,d)=1,(d,</w>)=1 → after the two
    // 2-count merges everything left is count-1
    val merges = Bpe.train(tiny, col("text"), numMerges = 10, minPairCount = 2)
    assert(merges.length == 2, merges.toString)
  }

  test("encode applies merges greedily left-to-right and counts tokens") {
    val merges = Bpe.train(docs, col("text"), numMerges = 3)
    val out = Bpe.encode(
      Seq((1L, "low"), (2L, "lowest"), (3L, "")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), merges)
      .select("doc_id", "tokens", "n_tokens")
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // low → l,o,w,</w> → (w,e) no-op → (l,o) → lo,w,</w>
    assert(out(1L) == ((Seq("lo", "w", "</w>"), 3L)))
    // lowest → l,o,w,e,s,t,</w> → (w,e) → l,o,we,s,t,</w> → (l,o) →
    // lo,we,s,t,</w>; (e,we) needs a bare "e" before "we" — no-op
    assert(out(2L) == ((Seq("lo", "we", "s", "t", "</w>"), 5L)))
    assert(out(3L) == ((Seq.empty[String], 0L)))
  }

  test("encode tolerates null text (empty tokens) and drops null ids, like train") {
    val merges = Bpe.train(docs, col("text"), numMerges = 2)
    val degenerate = Seq(
      (Some(1L), Some("low")),
      (Some(2L), None: Option[String]), // null text → zero tokens, row kept
      (None: Option[Long], Some("low")) // null id → unusable key, dropped
    ).toDF("doc_id", "text")
    val out = Bpe.encode(degenerate, col("doc_id"), col("text"), merges)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(2L) == 0L)
    assert(out(1L) > 0L)
  }

  test("encoding is stable across re-runs of training (deterministic ties)") {
    val a = Bpe.train(docs, col("text"), numMerges = 6)
    val b = Bpe.train(docs, col("text"), numMerges = 6)
    assert(a == b)
  }
}
