package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigram LM score: hand-computed add-one ppm, short docs keep NULL") {
    // reference corpus "a b a": bigrams (a,b)=1 (b,a)=1; unigrams a=2 b=1; V=2
    val lm = Seq((100L, "a b a")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // (a,b): (1+1)e6/(2+2)=500000; (b,c): (0+1)e6/(1+2)=333333
      (2L, "x"),     // no pairs
      (3L, "c a"))   // (c,a): (0+1)e6/(0+2)=500000
      .toDF("doc_id", "text")
    val out = NgramLm.bigramScore(docs, col("doc_id"), col("text"), lm, col("text"))
      .as[(Long, Long, Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, Some((500000L + 333333L) / 2))))
    assert(out(2L) == ((2L, 0L, None)), "sub-2-token doc surfaces with a NULL score")
    assert(out(3L) == ((3L, 1L, Some(500000L))))
    assert(out.size == 3)
  }

  test("scoring the reference corpus against itself beats random text") {
    val lm = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick dog runs over the brown fox")).toDF("doc_id", "text")
    val docs = Seq((10L, "the quick brown fox"), (11L, "zq wv xk pj qr"))
      .toDF("doc_id", "text")
    val out = NgramLm.bigramScore(docs, col("doc_id"), col("text"), lm, col("text"))
      .as[(Long, Long, Option[Long])].collect().map(r => r._1 -> r._3.get).toMap
    assert(out(10L) > out(11L),
      s"in-domain text must out-score gibberish: ${out(10L)} vs ${out(11L)}")
  }
}
