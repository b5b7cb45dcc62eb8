package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000000000L
  private val Base = Scale / 100 * 15

  test("pageRank: regular symmetric graph is a fixed point at the initial score") {
    // triangle: k-regular, so each node receives exactly k * (scale div k)
    // = scale per iteration and 0.15·scale + 0.85·scale = scale survives
    // every iteration bit-exactly
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val out = Graph.pageRank(pairs, col("a"), col("b"), iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out.values.toSet == Set(Scale))
  }

  test("pageRank: star hub outranks leaves, leaves tie") {
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)).toDF("a", "b")
    val out = Graph.pageRank(pairs, col("a"), col("b"), iterations = 5)
      .as[(Long, Long)].collect().toMap
    val leaves = Set(1L, 2L, 3L, 4L).map(out)
    assert(leaves.size == 1, "symmetric leaves must score identically")
    assert(out(10L) > leaves.head, "hub must outrank leaves")
  }

  test("pageRank: one iteration matches the hand-computed fixed-point step") {
    // path 1–2: both nodes have outdeg 1 and one in-edge, so after one
    // iteration score = base + 85·scale div 100 = scale for both
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val out = Graph.pageRank(pairs, col("a"), col("b"), iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> (Base + Scale / 100 * 85), 2L -> (Base + Scale / 100 * 85)))
  }

  test("pageRank: deterministic across runs and disjoint components independent") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    def run() = Graph.pageRank(pairs, col("a"), col("b"), iterations = 5)
      .as[(Long, Long)].collect().toMap
    val r1 = run()
    val r2 = run()
    assert(r1 == r2)
    // 5–6 is the same shape as an isolated edge: equal scores
    assert(r1(5L) == r1(6L))
    // middle of the path collects from two leaves — strictly more
    assert(r1(2L) > r1(1L) && r1(1L) == r1(3L))
    Corpus.unpersistIntermediates()
  }

  test("degrees: undirected per-vertex counts from an a<b pair table") {
    // star 1-{2,3,4} plus isolated edge 5-6
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Graph.degrees(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
    // handshake identity: Σ degree = 2 · |pairs|
    assert(got.values.sum == 8L)
  }
}
