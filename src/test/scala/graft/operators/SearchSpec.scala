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

  test("tokenization is lowercased alnum: punctuation splits, case folds") {
    val docs = Seq((1L, "Alpha, ALPHA! beta-2")).toDF("id", "txt")
    val got = Search.keywordTopK(docs, col("id"), col("txt"), Seq("alpha", "2"), 5)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3000000L))) // tf(alpha)=2, tf(2)=1, each df=1
  }
}
