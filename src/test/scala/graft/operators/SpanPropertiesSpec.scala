package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the duplicated-span family over random
  * corpora drawn from a tiny vocabulary (which forces heavy gram
  * collisions — the regime where merge bugs live):
  *   spans sit inside their document and are maximal-disjoint
  *   (consecutive spans leave ≥1 uncovered token between them),
  *   the whole operator matches an independent in-memory reference
  *   implementation, cutSpans conserves tokens, and
  *   contaminationSpans(df, df) covers every ≥k-token doc entirely.
  *
  * Generators are seeded deterministically so failures reproduce.
  */
class SpanPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val corpusGen: Gen[List[(Long, List[String])]] =
    Gen.choose(2, 14).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0, 20).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab))))
    }.map(_.zipWithIndex.map { case (ts, i) => (i.toLong + 1, ts) })

  private def sample(seed: Long): List[(Long, List[String])] =
    corpusGen.pureApply(Gen.Parameters.default, Seed(seed))

  /** Independent in-memory reference of duplicateSpans' semantics. */
  private def refSpans(
      docs: List[(Long, List[String])], k: Int): Set[(Long, Long, Long, Long)] = {
    val grams = docs.map { case (id, ts) =>
      id -> (if (ts.size >= k)
               (1 to ts.size - k + 1).map(p => p -> ts.slice(p - 1, p - 1 + k).mkString(" "))
             else Seq.empty)
    }
    val cnt = grams.flatMap(_._2.map(_._2)).groupBy(identity).map { case (g, o) => g -> o.size }
    grams.flatMap { case (id, ps) =>
      val dup = ps.collect { case (p, g) if cnt(g) >= 2 => p.toLong }.sorted
      if (dup.isEmpty) Seq.empty
      else {
        // merge: break when the next start jumps by more than k
        val runs = dup.tail.foldLeft(Vector(Vector(dup.head))) { (acc, p) =>
          if (p - acc.last.last > k) acc :+ Vector(p) else acc.init :+ (acc.last :+ p)
        }
        runs.map { r =>
          val (a, b) = (r.head, r.last + k - 1)
          (id, a, b, b - a + 1)
        }
      }
    }.toSet
  }

  test("duplicateSpans matches the in-memory reference on 25 random corpora") {
    (1 to 25).foreach { i =>
      val corpus = sample(i.toLong)
      val k = 2 + i % 3
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(df, col("doc_id"), col("text"), k = k)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = refSpans(corpus, k)
      assert(got == want, s"seed $i k=$k: got $got want $want")
      // structural invariants: in-bounds, disjoint with an uncovered gap
      val byDoc = got.groupBy(_._1)
      val lens = corpus.toMap.view.mapValues(_.size).toMap
      byDoc.foreach { case (id, spans) =>
        val sorted = spans.toList.sortBy(_._2)
        sorted.foreach { case (_, a, b, n) =>
          assert(a >= 1 && b <= lens(id) && n == b - a + 1, s"seed $i doc $id: $sorted")
        }
        sorted.sliding(2).foreach {
          case List((_, _, e1, _), (_, s2, _, _)) =>
            assert(s2 >= e1 + 2, s"seed $i doc $id spans touch: $sorted")
          case _ => ()
        }
      }
      Dedup.unpersistIntermediates(blocking = true)
    }
  }

  test("cutSpans conserves tokens and keeps exactly the uncovered ones (10 corpora)") {
    (1 to 10).foreach { i =>
      val corpus = sample(100L + i)
      val k = 2 + i % 3
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val spans = refSpans(corpus, k)
      val got = Dedup.cutSpans(df, col("doc_id"), col("text"), k = k)
        .as[(Long, String, Long, Long)].collect()
      assert(got.length == corpus.size, "one row per input doc")
      got.foreach { case (id, clean, kept, cut) =>
        val ts = corpus.toMap.apply(id)
        assert(kept + cut == ts.size, s"seed $i doc $id conservation")
        val covered = spans.collect { case (d, a, b, _) if d == id => (a, b) }
        val expect = ts.zipWithIndex.collect {
          case (t, idx) if !covered.exists { case (a, b) => idx + 1 >= a && idx + 1 <= b } => t
        }
        assert(clean == expect.mkString(" "), s"seed $i doc $id cut mismatch")
      }
      Dedup.unpersistIntermediates(blocking = true)
    }
  }

  test("contaminationSpans(df, df) covers every >=k-token doc end to end (10 corpora)") {
    (1 to 10).foreach { i =>
      val corpus = sample(200L + i)
      val k = 2 + i % 3
      val df = corpus.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.contaminationSpans(df, df, col("doc_id"), col("text"), k = k)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = corpus.collect { case (id, ts) if ts.size >= k =>
        (id, 1L, ts.size.toLong, ts.size.toLong)
      }.toSet
      assert(got == want, s"seed $i k=$k: got $got want $want")
      Dedup.unpersistIntermediates(blocking = true)
    }
  }
}
