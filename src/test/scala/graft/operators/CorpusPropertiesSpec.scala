package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the corpus-curation operators over
  * arbitrary corpora (random id gaps, token counts, budgets, shard
  * counts):
  *   packing is a partition of the corpus,
  *   no multi-doc pack exceeds the budget,
  *   pack ids are contiguous and monotone in doc order,
  *   packing is greedy-maximal (the first doc of pack p+1 never fits p),
  *   hash sampling composes: sample(subset) == subset(sample).
  *
  * Generators are seeded deterministically so failures reproduce.
  */
class CorpusPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // sparse non-negative ids (gaps exercise the shard hash), 0..30 tokens
  private val corpusGen: Gen[List[(Long, Int)]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        id <- Gen.choose(0L, 500L)
        tok <- Gen.choose(0, 30)
      } yield (id, tok))
    }.map(_.groupBy(_._1).map { case (id, rs) => (id, rs.head._2) }.toList)

  private def sample(seed: Long): List[(Long, Int)] =
    corpusGen.pureApply(Gen.Parameters.default, Seed(seed))

  test("packTokens: partition, budget, contiguity, greedy maximality (20 random corpora)") {
    (1 to 20).foreach { i =>
      val corpus = sample(i.toLong)
      val budget = 10L + (i * 7) % 60
      val shards = 1 + i % 5
      // text with a known token count: k repetitions of a word
      val df = corpus.map { case (id, k) => (id, Seq.fill(k)("tok").mkString(" ")) }
        .toDF("doc_id", "text")
      val out = Corpus.packTokens(df, col("doc_id"), col("text"), shards, budget)
        .as[(Long, Long, Long, Long)].collect()

      // partition: every doc exactly once, with its true token count and shard
      assert(out.length == corpus.size, s"case $i: lost or duplicated docs")
      val toks = corpus.toMap
      out.foreach { case (sh, id, n, _) =>
        assert(n == toks(id).toLong, s"case $i: token count mismatch for $id")
        assert(sh == (id * Corpus.ShardMult) % shards, s"case $i: wrong shard for $id")
      }

      out.groupBy(_._1).foreach { case (_, rows) =>
        val inOrder = rows.sortBy(_._2)
        // pack ids contiguous from 1 and monotone in doc order
        val packs = inOrder.map(_._4)
        assert(packs.head == 1L, s"case $i: first pack must be 1")
        packs.sliding(2).foreach { w =>
          if (w.size == 2) assert(w(1) == w(0) || w(1) == w(0) + 1,
            s"case $i: pack ids must step by 0 or 1, got $packs")
        }
        val byPack = inOrder.groupBy(_._4)
        byPack.foreach { case (p, members) =>
          val total = members.map(_._3).sum
          // budget respected unless a single oversized doc
          assert(total <= budget || members.size == 1,
            s"case $i: pack $p over budget ($total > $budget) with ${members.size} docs")
          // greedy maximality: the opener of the next pack did not fit here
          byPack.get(p + 1).foreach { next =>
            val opener = next.minBy(_._2)._3
            assert(total + opener > budget,
              s"case $i: pack ${p + 1}'s opener ($opener tokens) fit pack $p ($total/$budget)")
          }
        }
      }
    }
  }

  test("stratifiedSample composes: sample of a subset == subset of the sample") {
    (1 to 10).foreach { i =>
      val corpus = sample(100L + i)
      val df = corpus.map { case (id, k) => (id, if (k % 2 == 0) "en" else "de") }
        .toDF("doc_id", "lang")
      val rates = Map("en" -> 30)
      def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
        Corpus.stratifiedSample(d, col("doc_id"), col("lang"), rates, 60)
          .select("doc_id").as[Long].collect().toSet
      val whole = ids(df)
      val subset = df.filter(col("doc_id") % 3 === 0)
      assert(ids(subset) == whole.filter(_ % 3 == 0),
        s"case $i: hash sampling must commute with subsetting")
    }
  }
}
