package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants of the sketch aggregators — the properties that
  * make them merge-order independent under ANY partitioning, shuffle
  * order, or streaming trigger sequence:
  *
  *   QuantileSample: bottom-k is a semilattice — merge(bk(a), bk(b)) ==
  *   bk(a ++ b), merge commutes, and reduce-one-by-one equals merging
  *   singleton buffers (so map-side partials cannot diverge from the
  *   all-at-once result).
  *
  *   CountMinSketch: cells are sums — merge commutes and associates, and
  *   any split of the input reduces to the same sketch.
  *
  * Pure JVM tests (no Spark) over ScalaCheck-generated inputs; seeds are
  * deterministic so failures reproduce.
  */
class SketchPropertiesSpec extends AnyFunSuite {

  private def samples(seed: Long, n: Int): List[(Long, Long, Double)] = {
    val g = Gen.listOfN(n, for {
      h <- Gen.choose(0L, 50L) // small range → frequent hash ties
      id <- Gen.choose(0L, 1000L)
      v <- Gen.choose(-100.0, 100.0)
    } yield (h, id, v))
    g.apply(Gen.Parameters.default, Seed(seed)).get
  }

  private def reduceAll(agg: QuantileSample, rows: List[(Long, Long, Double)]) =
    rows.foldLeft(agg.zero)(agg.reduce)

  test("bottom-k sample: merge of partial sketches equals the one-shot sketch") {
    val agg = new QuantileSample(8)
    (1L to 40L).foreach { seed =>
      val rows = samples(seed, 60)
      (0 to rows.length by 7).foreach { cut =>
        val (a, b) = rows.splitAt(cut)
        val merged = agg.merge(reduceAll(agg, a), reduceAll(agg, b))
        assert(merged.toSeq == reduceAll(agg, rows).toSeq,
          s"seed=$seed cut=$cut")
      }
    }
  }

  test("bottom-k sample: merge commutes (up to the total (hash,id) order)") {
    val agg = new QuantileSample(6)
    (1L to 30L).foreach { seed =>
      val a = reduceAll(agg, samples(seed, 25))
      val b = reduceAll(agg, samples(seed + 1000, 25))
      // merge mutates neither input's relevance: compare value sequences
      val ab = agg.merge(reduceAll(agg, samples(seed, 25)),
        reduceAll(agg, samples(seed + 1000, 25))).toSeq
      val ba = agg.merge(b, a).toSeq
      assert(ab == ba, s"seed=$seed")
    }
  }

  test("count-min: any input split reduces+merges to the identical cell array") {
    val agg = new CountMinSketch(3, 16)
    (1L to 30L).foreach { seed =>
      val keys = samples(seed, 80).map(_._2 % 1000000007L)
      val whole = keys.foldLeft(agg.zero)(agg.reduce)
      (0 to keys.length by 11).foreach { cut =>
        val (a, b) = keys.splitAt(cut)
        val merged = agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        assert(merged.toSeq == whole.toSeq, s"seed=$seed cut=$cut")
      }
    }
  }

  test("count-min: merge is commutative and associative") {
    val agg = new CountMinSketch(2, 8)
    (1L to 20L).foreach { seed =>
      def sk(s: Long) =
        samples(s, 30).map(_._2).foldLeft(agg.zero)(agg.reduce)
      val (x, y, z) = (sk(seed), sk(seed + 500), sk(seed + 900))
      assert(agg.merge(sk(seed), sk(seed + 500)).toSeq ==
        agg.merge(sk(seed + 500), sk(seed)).toSeq)
      assert(agg.merge(agg.merge(x, y), z).toSeq ==
        agg.merge(sk(seed), agg.merge(sk(seed + 500), sk(seed + 900))).toSeq)
    }
  }
}
