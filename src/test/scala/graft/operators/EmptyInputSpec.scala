package graft.operators

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empty-corpus behavior: a 100 TB pipeline's first production incident is
  * usually an empty partition, date slice, or filtered-to-nothing input —
  * every operator must return an empty (correctly-schemed) result, not
  * throw from some assumption about rows existing. Training-style
  * operators that return model artifacts return empty/identity models.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
  private def emptyPairs: DataFrame =
    Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
  private def emptyVecs: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup tiers return empty results on an empty corpus") {
    assert(Dedup.exact(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.minhashLshPairs(emptyDocs, col("doc_id"), col("text"),
      n = 3, numHashes = 8, bands = 2, minJaccard = 0.5).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs, col("doc_id"), col("text"),
      maxHamming = 3).count() == 0)
    assert(Dedup.clusterPairs(emptyPairs).count() == 0)
    assert(Dedup.segmentDedup(emptyDocs, col("doc_id"), col("text"),
      sep = "\n", dfPpmThreshold = 500000L).count() == 0)
    Dedup.unpersistIntermediates(blocking = true)
  }

  test("corpus curation returns empty results on an empty corpus") {
    assert(Corpus.quotaSample(emptyDocs, col("doc_id"), col("lang"), cap = 5)
      .count() == 0)
    assert(Corpus.weightedSample(emptyDocs, col("doc_id"), col("lang"),
      lit(1L), cap = 5).count() == 0)
    assert(Corpus.stratifiedSample(emptyDocs, col("doc_id"), col("lang"),
      ratesPct = Map("en" -> 50), defaultPct = 50).count() == 0)
    assert(Corpus.packTokens(emptyDocs, col("doc_id"), col("text"),
      numShards = 4, budget = 100L).count() == 0)
    assert(Corpus.chunkTokens(emptyDocs, col("doc_id"), col("text"),
      chunkSize = 8, overlap = 2).count() == 0)
    assert(Corpus.snapshotDiff(emptyDocs, emptyDocs, col("doc_id"),
      col("text")).count() == 0)
    assert(Corpus.epochOrder(emptyDocs, col("doc_id"), epoch = 1).count() == 0)
    assert(Corpus.targetMix(emptyDocs, col("doc_id"), col("lang"),
      Map("en" -> 1000000L)).count() == 0)
    assert(Corpus.dsirScores(emptyDocs, col("doc_id"), col("text"),
      col("lang") === "en").count() == 0)
    Corpus.unpersistIntermediates(blocking = true)
  }

  test("r7 operators return empty (or empty-model) results on empty input") {
    assert(Graph.pageRank(emptyPairs, col("doc_a"), col("doc_b"), 3).count() == 0)
    assert(Corpus.upsampleMix(emptyDocs, col("doc_id"), col("lang"),
      Map("en" -> 1500000L)).count() == 0)
    val est = Profile.joinCardinalityEstimate(emptyDocs, col("doc_id"),
      emptyDocs, col("doc_id")).collect().head
    assert(est.getAs[Long]("n_a") == 0L && est.getAs[Long]("est_rows") == 0L)
    Dedup.unpersistIntermediates(blocking = true)
    Corpus.unpersistIntermediates(blocking = true)
  }

  test("containment, RRF fusion, and compaction planning handle empty input") {
    assert(Dedup.containmentPairs(emptyDocs, col("doc_id"), col("text"),
      n = 3, minContainmentPpm = 700000L).count() == 0)
    val emptyRanks = Seq.empty[(Long, Long)].toDF("doc_id", "rank")
    assert(Search.rrfFuse(Seq(emptyRanks, emptyRanks), k = 10).count() == 0)
    val emptyManifest = Seq.empty[(String, Long, Long)].toDF("src", "fid", "sz")
    assert(Layout.compactionPlan(emptyManifest, col("src"), col("fid"),
      col("sz"), targetBytes = 1024L).count() == 0)
    assert(Corpus.blocklistFilter(emptyDocs, col("doc_id"), col("text"),
      Map("x" -> Seq("bad")), 0L).count() == 0)
    assert(Corpus.curriculumOrder(emptyDocs, col("doc_id"), lit(0L), tiers = 4)
      .count() == 0)
    Dedup.unpersistIntermediates(blocking = true)
    Corpus.unpersistIntermediates(blocking = true)
  }

  test("span family handles empty inputs on either side") {
    assert(Dedup.duplicateSpans(emptyDocs, col("doc_id"), col("text"), k = 3)
      .count() == 0)
    // cutSpans on empty corpus: nothing to cut, nothing to emit
    assert(Dedup.cutSpans(emptyDocs, col("doc_id"), col("text"), k = 3)
      .count() == 0)
    val someDocs = Seq((1L, "a few plain words here")).toDF("doc_id", "text")
    // empty benchmark → nothing is contaminated
    assert(Dedup.contaminationSpans(someDocs, emptyDocs,
      col("doc_id"), col("text"), k = 3).count() == 0)
    // empty train side → no spans regardless of the benchmark
    assert(Dedup.contaminationSpans(emptyDocs, someDocs,
      col("doc_id"), col("text"), k = 3).count() == 0)
    // span-free corpus: cutSpans is the identity on token-space text
    val kept = Dedup.cutSpans(someDocs, col("doc_id"), col("text"), k = 3)
      .select("clean_text", "n_tokens_cut").as[(String, Long)].collect().head
    assert(kept == (("a few plain words here", 0L)))
    Dedup.unpersistIntermediates(blocking = true)
  }

  test("BPE trains an empty model and encodes with it on an empty corpus") {
    val merges = Bpe.train(emptyDocs, col("text"), numMerges = 5)
    assert(merges.isEmpty)
    assert(Bpe.encode(emptyDocs, col("doc_id"), col("text"), merges).count() == 0)
  }

  test("similarity tiers return empty rankings when base or queries are empty") {
    assert(Similarity.bruteForceTopK(emptyVecs, emptyVecs,
      col("vec_id"), col("embedding"), k = 5).count() == 0)
    val base = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    // empty queries against a real base: no rows, no failure
    assert(Similarity.bruteForceTopK(base, emptyVecs,
      col("vec_id"), col("embedding"), k = 5).count() == 0)
  }

  test("profiles of an empty table report zero rows, not an error") {
    val out = Profile.profile(emptyDocs, Seq("doc_id", "lang"))
      .select("col_name", "n").as[(String, Long)].collect().toMap
    assert(out == Map("doc_id" -> 0L, "lang" -> 0L))
  }

  test("salted join on empty sides yields empty") {
    assert(SkewJoin.salted(emptyDocs, col("lang"), col("doc_id"),
      Seq(("en", 1L)).toDF("dkey", "dval"), col("dkey"), saltFactor = 4)
      .count() == 0)
  }

  test("skew aggregation on an empty table yields empty, not a crash") {
    assert(SkewAgg.distinctAndTotals(emptyDocs, col("lang"), col("doc_id"),
      col("doc_id")).count() == 0)
    assert(SkewAgg.skewReport(emptyDocs, col("lang")).count() == 0)
  }
}
