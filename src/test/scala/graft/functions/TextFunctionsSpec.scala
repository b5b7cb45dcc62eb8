package graft.functions

import graft.TestSpark
import graft.functions.TextFunctions._

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](text: String, c: Column => Column): T =
    Seq(text).toDF("t").select(c(col("t"))).collect()(0).get(0).asInstanceOf[T]

  /** Array-typed results come back as mutable ArraySeq — normalize. */
  private def oneSeq[T](text: String, c: Column => Column): Seq[T] =
    one[scala.collection.Seq[T]](text, c).toList

  /** Scala reimplementation of the polynomial hash, the ground truth the
    * Column expression must reproduce.
    */
  private def refPolyHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % HashP)

  test("tokens lowercases and strips punctuation/empties") {
    assert(oneSeq[String]("Hello, World!  x2", tokens) == Seq("hello", "world", "x2"))
    assert(oneSeq[String]("", tokens) == Seq.empty)
    assert(oneSeq[String]("...", tokens) == Seq.empty)
  }

  test("polyHash matches the reference fold, including empty string") {
    for (s <- Seq("", "a", "ab", "hello world", "zz9 zz9"))
      assert(one[Long](s, polyHash) == refPolyHash(s), s"for '$s'")
  }

  test("native PolyHash expression ≡ declarative HOF formulation") {
    for (s <- Seq("", "a", "hello world!", "ümlaut text", "a b c d e f g"))
      assert(one[Long](s, polyHash) == one[Long](s, polyHashHof), s"for '$s'")
  }

  test("shingles: distinct word 3-grams, short docs yield none") {
    assert(oneSeq[String]("a b c d", t => shingles(tokens(t), 3)) ==
      Seq("a b c", "b c d"))
    assert(oneSeq[String]("a b", t => shingles(tokens(t), 3)) == Seq.empty)
    // duplicates collapse
    assert(oneSeq[String]("a b c a b c a b c", t => shingles(tokens(t), 3)).size == 3)
  }

  test("minhash signature is k-long, deterministic, and dominated by min") {
    val sig = oneSeq[Long]("a b c d e", t => minhashSignature(shingles(tokens(t), 3), 16))
    assert(sig.size == 16)
    val sig2 = oneSeq[Long]("a b c d e", t => minhashSignature(shingles(tokens(t), 3), 16))
    assert(sig == sig2)
    // signature of a superset document is elementwise <= (more shingles can
    // only lower each min)
    val sub = oneSeq[Long]("a b c d", t => minhashSignature(shingles(tokens(t), 3), 16))
    val sup = oneSeq[Long]("a b c d e", t => minhashSignature(shingles(tokens(t), 3), 16))
    assert(sub.zip(sup).forall { case (a, b) => b <= a })
  }

  test("langId: stopword votes + CJK detection") {
    assert(one[String]("the cat sat on the mat and slept", langId) == "en")
    assert(one[String]("der hund und die katze ist nicht da", langId) == "de")
    assert(one[String]("le chat est dans la maison et le jardin", langId) == "fr")
    assert(one[String]("el perro y los gatos es una casa", langId) == "es")
    assert(one[String]("你好世界", langId) == "zh")
    assert(one[String]("zzz qqq", langId) == "unknown")
  }

  test("quality score stays in [0,1] and rewards clean english text") {
    val good = one[Double](("the quick brown fox jumps over the lazy dog and " * 12), qualityScore)
    val junk = one[Double]("@#$% ^&*! ~~~", qualityScore)
    assert(good > junk)
    for (s <- Seq("", "a", "the the the", "@#$%"); q = one[Double](s, qualityScore))
      assert(q >= 0.0 && q <= 1.0, s"for '$s': $q")
  }

  test("bpeish count: letter runs + digit runs + symbols") {
    assert(one[Int]("abc 123 x!", bpeishCount) == 4) // abc, 123, x, !
  }

  test("distinctTokenPpm: repetition lowers the ratio; empty is zero") {
    assert(one[Long]("a a b", distinctTokenPpm) == 2L * 1000000L / 3L)
    assert(one[Long]("a b c", distinctTokenPpm) == 1000000L)
    assert(one[Long]("", distinctTokenPpm) == 0L)
  }

  test("symbolPpm counts non-alnum non-space characters") {
    assert(one[Long]("ab!!", symbolPpm) == 500000L)
    assert(one[Long]("clean text here", symbolPpm) == 0L)
    assert(one[Long]("", symbolPpm) == 0L)
  }

  test("scrub redacts PII-shaped patterns: emails and IPv4") {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
    val s = "contact bob@example.com or alice@corp.io from 10.0.0.1 today"
    assert(one[Long](s, scrubCount(_, email)) == 2L)
    assert(one[Long](s, scrubCount(_, ip)) == 1L)
    assert(one[String](s, scrub(_, email, "<EMAIL>")) ==
      "contact <EMAIL> or <EMAIL> from 10.0.0.1 today")
    assert(one[String](s, scrub(_, ip, "<IP>")) ==
      "contact bob@example.com or alice@corp.io from <IP> today")
    assert(one[Long]("no pii here", scrubCount(_, email)) == 0L)
    assert(one[String]("no pii here", scrub(_, email, "<EMAIL>")) == "no pii here")
  }

  test("scrub denylist: word boundaries protect substrings") {
    val deny = "\\b(customer|order|part)\\b"
    // 'partition' and 'orders' must NOT match inside word boundaries
    val s = "customer order partition orders part"
    assert(one[Long](s, scrubCount(_, deny)) == 3L)
    assert(one[String](s, scrub(_, deny, "[X]")) == "[X] [X] partition orders [X]")
  }
}
