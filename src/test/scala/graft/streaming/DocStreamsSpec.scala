package graft.streaming

import graft.TestSpark
import graft.operators.Dedup

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val storeDocs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog again and again"),
    (11L, "completely unrelated existing content about spark engines"))
  private val incDocs = Seq(
    (20L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 10
    (21L, "novel text that matches nothing else in any corpus batch"),
    (22L, "xy")) // shingle-less: filtered before the probe

  test("streaming contamination gate matches the batch tier against the same store") {
    implicit val sqlCtx = spark.sqlContext
    val store = storeDocs.toDF("doc_id", "text")
    val sigStore = Dedup.minhashStore(store, col("doc_id"), col("text"))
    Dedup.writeBandStore(sigStore, "graft_stream_store",
      numHashes = 16, bands = 4, buckets = 8)
    val storeBands = spark.table("graft_stream_store")
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.contaminationStream(
      stream.toDF().toDF("doc_id", "text"), storeBands,
      col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("contam")
      .outputMode("append").start()
    try {
      stream.addData(incDocs: _*)
      q.processAllAvailable()
      val got = spark.table("contam")
        .select("doc_id", "partner").distinct()
        .as[(Long, Long)].collect().toSet
      assert(got == Set((20L, 10L)), s"got $got")
      // parity with the batch tier over the SAME bucketed store: the
      // streamed matches reduce to exactly the batch dup_of decisions
      val batch = Dedup.incrementalDedupBanded(
        incDocs.toDF("doc_id", "text"), storeBands,
        col("doc_id"), col("text"), withinBatch = false)
        .filter(col("dup_of").isNotNull)
        .as[(Long, Long)].collect().toSet
      assert(got == batch, s"stream $got vs batch $batch")
      // a second micro-batch probes the same static store independently
      stream.addData((30L, storeDocs(1)._2)) // dup of 11
      q.processAllAvailable()
      val got2 = spark.table("contam")
        .select("doc_id", "partner").distinct()
        .as[(Long, Long)].collect().toSet
      assert(got2 == Set((20L, 10L), (30L, 11L)), s"got $got2")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_stream_store")
      Dedup.unpersistIntermediates(blocking = true)
    }
  }

  test("the streaming gate keeps no state: progress reports zero state rows") {
    implicit val sqlCtx = spark.sqlContext
    val store = storeDocs.toDF("doc_id", "text")
    Dedup.writeBandStore(
      Dedup.minhashStore(store, col("doc_id"), col("text")),
      "graft_stream_store2", numHashes = 16, bands = 4, buckets = 4)
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.contaminationStream(
      stream.toDF().toDF("doc_id", "text"),
      spark.table("graft_stream_store2"),
      col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("contam_stateless")
      .outputMode("append").start()
    try {
      stream.addData(incDocs: _*)
      q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress.stateOperators.isEmpty,
        s"stream-static gate must be stateless, got ${progress.stateOperators.length} state operators")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS graft_stream_store2")
      Dedup.unpersistIntermediates(blocking = true)
    }
  }

  test("streaming gram gate: mergeSpans over streamed hits equals the batch bloom gate") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (1L, "intro words the exact eval question text here closing words"),
      (2L, "nothing shared with the benchmark at all today"))
    val bench = Seq((100L, "the exact eval question text here"))
      .toDF("doc_id", "text")
    val benchGrams = bench
      .select(explode(graft.functions.TextFunctions.posGrams(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("pg"))
      .select(col("pg.g").as("g")).distinct()
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.contaminationHitsStream(
      stream.toDF().toDF("doc_id", "text"), benchGrams,
      col("doc_id"), col("text"), k = 3, expectedGrams = 64)
      .writeStream.format("memory").queryName("gram_hits")
      .outputMode("append").start()
    try {
      stream.addData(train: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty, "gram gate must be stateless")
      val hits = spark.table("gram_hits")
      val streamedSpans = Dedup.mergeSpans(hits, k = 3)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batchSpans = Dedup.contaminationSpansBloom(
        train.toDF("doc_id", "text"), bench,
        col("doc_id"), col("text"), k = 3, expectedGrams = 64)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamedSpans == batchSpans && batchSpans.nonEmpty,
        s"stream $streamedSpans vs batch $batchSpans")
    } finally {
      q.stop()
      Dedup.unpersistIntermediates(blocking = true)
    }
  }

  test("streaming gram gate cold-start: pre-built sketch + gram parquet ≡ one-shot gate") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (1L, "intro words the exact eval question text here closing words"),
      (2L, "nothing shared with the benchmark at all today"))
    val bench = Seq((100L, "the exact eval question text here"))
      .toDF("doc_id", "text")
    // the deployment artifacts: gram set on disk, sketch bytes anywhere
    val dir = java.nio.file.Files.createTempDirectory("streamgrams").toString
    Dedup.benchGramSet(bench, col("text"), k = 3)
      .write.mode("overwrite").parquet(dir)
    val bg = spark.read.parquet(dir)
    val sketch = graft.operators.BloomJoin.sketchBytes(bg, "g", expectedItems = 64)
    val stream = MemoryStream[(Long, String)]
    // cold start: no benchmark TEXT frame anywhere in this stream
    val q = DocStreams.contaminationHitsStream(
      stream.toDF().toDF("doc_id", "text"), bg, sketch,
      col("doc_id"), col("text"), k = 3)
      .writeStream.format("memory").queryName("gram_hits_cold")
      .outputMode("append").start()
    try {
      stream.addData(train: _*)
      q.processAllAvailable()
      val streamedSpans = Dedup.mergeSpans(spark.table("gram_hits_cold"), k = 3)
        .as[(Long, Long, Long, Long)].collect().toSet
      val batchSpans = Dedup.contaminationSpansBloom(
        train.toDF("doc_id", "text"), bench,
        col("doc_id"), col("text"), k = 3, expectedGrams = 64)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamedSpans == batchSpans && batchSpans.nonEmpty,
        s"cold-start $streamedSpans vs batch $batchSpans")
    } finally {
      q.stop()
      Dedup.unpersistIntermediates(blocking = true)
    }
  }

  test("streaming gram gate evaluates the benchmark gram pipeline once, not per batch") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((100L, "the exact eval question text here"))
      .toDF("doc_id", "text")
    // count row-level evaluations of the gram pipeline: the persisted
    // static side should materialize ONCE (≈ nGrams touches); without the
    // cache the probe, the sketch build, and EACH micro-batch's
    // stream-static join would re-run it (≥ 4 × nGrams for two batches)
    val acc = spark.sparkContext.longAccumulator("gramEvals")
    val counted = Dedup.benchGramSet(bench, col("text"), k = 3)
      .as[String].map { g => acc.add(1); g }.toDF("g")
    val nGrams = 4 // 6 tokens, k=3 → 4 positional grams, all distinct
    val stream = MemoryStream[(Long, String)]
    val q = DocStreams.contaminationHitsStream(
      stream.toDF().toDF("doc_id", "text"), counted,
      col("doc_id"), col("text"), k = 3, expectedGrams = 64)
      .writeStream.format("memory").queryName("gram_hits_once")
      .outputMode("append").start()
    try {
      stream.addData((1L, "intro words the exact eval question text here"))
      q.processAllAvailable()
      stream.addData((2L, "the exact eval question text here again"))
      q.processAllAvailable()
      assert(spark.table("gram_hits_once").count() > 0)
      assert(acc.value <= 2L * nGrams,
        s"benchmark gram pipeline evaluated ${acc.value} row-touches for " +
          s"$nGrams grams — static side not persisted?")
    } finally {
      q.stop()
      Dedup.unpersistIntermediates(blocking = true)
    }
  }
}
