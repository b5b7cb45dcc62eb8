package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta beta"),
    (2L, "alpha gamma"),
    (3L, "beta delta delta delta"),
    (4L, "unrelated words only")).toDF("id", "txt")

  private def search(terms: Seq[String], k: Int = 10): Seq[(Long, Long)] =
    Search.keywordTopK(corpus, col("id"), col("txt"), terms, k)
      .as[(Long, Long)].collect().toSeq

  test("scores are tf × (scale div df), summed over query terms") {
    // df(alpha)=2 → w=500000; df(beta)=2 → w=500000
    // doc1: 1×500000 + 2×500000 = 1500000; doc2: 500000; doc3: 500000
    val got = search(Seq("alpha", "beta"))
    assert(got == Seq((1L, 1500000L), (2L, 500000L), (3L, 500000L)))
  }

  test("rare terms dominate common ones") {
    // df(delta)=1 → w=1000000 beats df(beta)=2 even at equal tf
    val got = search(Seq("beta", "delta"))
    assert(got.head._1 == 3L) // 3×1000000 + 1×500000
    assert(got.head._2 == 3500000L)
  }

  test("ties rank by ascending doc id (doc2 before doc3 at equal score)") {
    val got = search(Seq("alpha", "beta")).drop(1)
    assert(got.map(_._1) == Seq(2L, 3L))
  }

  test("k truncates; unmatched docs never appear") {
    assert(search(Seq("alpha", "beta"), k = 1).map(_._1) == Seq(1L))
    assert(!search(Seq("alpha")).map(_._1).contains(4L))
  }

  test("no matching term anywhere → empty result") {
    assert(search(Seq("zzz")).isEmpty)
  }

  test("batch search: per-query ranking, GLOBAL df for shared terms, k per query") {
    val queries = Seq(
      (1L, "alpha"), (1L, "beta"),
      (2L, "beta"), (2L, "delta"),
      (3L, "zzz")).toDF("query_id", "term")
    val got = Search.keywordTopKBatch(corpus, col("id"), col("txt"), queries, k = 2)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Long, Long)].collect().toSet
    // df(alpha)=2, df(beta)=2, df(delta)=1 — identical to the single-query
    // runs even though beta appears in two queries
    assert(got == Set(
      (1L, 1L, 1500000L, 1L), (1L, 2L, 500000L, 2L), // q1: alpha+beta
      (2L, 3L, 3500000L, 1L), (2L, 1L, 1000000L, 2L) // q2: beta+delta
    )) // q3 matches nothing

    // parity with N single-query runs at the same k
    val single = Search.keywordTopK(corpus, col("id"), col("txt"),
      Seq("alpha", "beta"), 2).as[(Long, Long)].collect().toSet
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._3)) == single)
  }

  test("tokenization is lowercased alnum: punctuation splits, case folds") {
    val docs = Seq((1L, "Alpha, ALPHA! beta-2")).toDF("id", "txt")
    val got = Search.keywordTopK(docs, col("id"), col("txt"), Seq("alpha", "2"), 5)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3000000L))) // tf(alpha)=2, tf(2)=1, each df=1
  }

  private def ranks(rs: (Long, Long)*) = rs.toDF("doc_id", "rank")

  test("rrfFuse: cross-list agreement dominates any single list") {
    // doc 20 is rank 2 + rank 1; every solo doc scores below it
    val got = Search.rrfFuse(Seq(
      ranks((10L, 1L), (20L, 2L), (30L, 3L)),
      ranks((20L, 1L), (40L, 2L))), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val s = (r: Long) => 1000000000L / (60L + r)
    assert(got == Seq(
      (20L, 2L, s(2) + s(1)), (10L, 1L, s(1)),
      (40L, 1L, s(2)), (30L, 1L, s(3))))
  }

  test("rrfFuse: equal fused scores tie-break on ascending doc id; k truncates") {
    val got = Search.rrfFuse(Seq(ranks((7L, 1L)), ranks((3L, 1L))), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(3L, 7L))
    assert(Search.rrfFuse(Seq(ranks((7L, 1L)), ranks((3L, 1L))), k = 1)
      .as[(Long, Long, Long)].collect().toSeq.map(_._1) == Seq(3L))
  }

  test("rrfFuse: empty lists fuse to empty; rrfK shifts the damping") {
    assert(Search.rrfFuse(Seq(ranks()), k = 5).count() == 0L)
    val got = Search.rrfFuse(Seq(ranks((1L, 1L))), k = 5, rrfK = 0L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 1000000000L)))
  }
}
