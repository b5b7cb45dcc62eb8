package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: 10× scale-up dry run for newly added operators (the SURVEY
  * §8 evidence harness). Replicates the sf documents table 10× with
  * disjoint ids and per-replica word-suffixed text — each replica keeps
  * the base corpus's dup density with no cross-replica near-dups — then
  * times an operator at 1× and 10× warm. A scale-safe operator should grow
  * ≈ linearly (or with its output size); a quadratic bend fails the check.
  *
  * Usage: runMain graft.DryRun [sfDir] [op...]
  * ops: pagerank upsample mad fuzzy mmr prefix containment containment_capped
  * (default: all but containment and containment_capped)
  */
object DryRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ops = if (args.length > 1) args.drop(1).toSet
              else Set("pagerank", "upsample", "mad", "fuzzy", "mmr", "prefix")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    // suffix EVERY word: all shingles become replica-local, so each
    // replica keeps the base corpus's dup density with no cross-replica
    // near-dups (a trailing doc suffix leaves nearly every shingle shared
    // and the pair graph would grow ~replicas², not linearly)
    def replica(k: Int): DataFrame = docs.select(
      (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
      regexp_replace(col("text"), "(\\S+)", s"$$1r$k").as("text"),
      col("lang"), col("source"), col("n_chars"))
    val big = (0 until 10).map(replica).reduce(_ union _)

    def time(name: String)(body: => DataFrame): Unit = {
      // warm once, then measure; the row count comes from the WARM pass so
      // the timed pass is exactly one noop write (no post-hoc re-execution)
      var rows = -1L
      (1 to 2).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        graft.operators.Dedup.unpersistIntermediates()
        graft.operators.Corpus.unpersistIntermediates()
        graft.operators.Graph.unpersistIntermediates()
        val t0 = System.nanoTime()
        val df = body
        df.write.mode("overwrite").format("noop").save()
        if (i == 1) rows = df.count()
        else println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows $rows)")
      }
    }

    import graft.operators.{Corpus, Dedup, Graph}
    def pairsOf(d: DataFrame) = Dedup.minhashLshPairs(
      d, col("doc_id"), col("text"), n = 3, numHashes = 32, bands = 4, minJaccard = 0.5)

    if (ops("pagerank")) {
      time("pagerank_1x")(Graph.pageRank(pairsOf(docs), col("doc_a"), col("doc_b"), 5))
      time("pagerank_10x")(Graph.pageRank(pairsOf(big), col("doc_a"), col("doc_b"), 5))
    }
    if (ops("upsample")) {
      val recipe = Map("en" -> 1500000L, "de" -> 2250000L, "fr" -> 1000000L, "zh" -> 700000L)
      time("upsample_1x")(Corpus.upsampleMix(docs, col("doc_id"), col("lang"), recipe))
      time("upsample_10x")(Corpus.upsampleMix(big, col("doc_id"), col("lang"), recipe))
    }
    if (ops("mad")) {
      def madProfile(d: DataFrame): DataFrame = {
        val med = d.groupBy("source").agg(percentile(col("n_chars"), lit(0.5)).as("med_chars"))
        val dev = d.join(broadcast(med), "source")
          .select(col("source"), col("med_chars"),
            abs(col("n_chars") - col("med_chars")).as("_ad"))
        val mad = dev.groupBy("source").agg(percentile(col("_ad"), lit(0.5)).as("mad_chars"))
        dev.join(broadcast(mad), "source")
          .groupBy(col("source"), col("med_chars"), col("mad_chars"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("_ad") > lit(3.0) * col("mad_chars"), 1L).otherwise(0L)).as("n_outliers"))
      }
      time("mad_1x")(madProfile(docs))
      time("mad_10x")(madProfile(big))
    }
    if (ops("prefix")) {
      time("prefix_1x")(graft.operators.Dedup.prefixJaccardPairs(
        docs, col("doc_id"), col("text"), n = 3, minJaccardPpm = 500000L))
      time("prefix_10x")(graft.operators.Dedup.prefixJaccardPairs(
        big, col("doc_id"), col("text"), n = 3, minJaccardPpm = 500000L))
    }
    if (ops("containment")) {
      time("containment_1x")(graft.operators.Dedup.containmentPairs(
        docs, col("doc_id"), col("text"), n = 3, minContainmentPpm = 700000L))
      time("containment_10x")(graft.operators.Dedup.containmentPairs(
        big, col("doc_id"), col("text"), n = 3, minContainmentPpm = 700000L))
    }
    if (ops("containment_capped")) {
      time("containment_capped_1x")(graft.operators.Dedup.containmentPairs(
        docs, col("doc_id"), col("text"), n = 3, minContainmentPpm = 700000L,
        maxDocFreq = 50))
      time("containment_capped_10x")(graft.operators.Dedup.containmentPairs(
        big, col("doc_id"), col("text"), n = 3, minContainmentPpm = 700000L,
        maxDocFreq = 50))
    }
    if (ops("fuzzy")) {
      // per-replica name suffix keeps each replica's near-miss density
      // with no cross-replica pairs (two replicas differ in ≥ 2 edits)
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("c_custkey"), col("c_name"))
      def crep(k: Int) = cust.select(
        (col("c_custkey") + lit(k.toLong * 10000000L)).as("c_custkey"),
        concat(col("c_name"), lit(s"#rep$k$k")).as("c_name"))
      val bigCust = (0 until 10).map(crep).reduce(_ union _)
      time("fuzzy_1x")(graft.operators.FuzzyJoin.selfJoin(
        crep(0), col("c_custkey"), col("c_name")))
      time("fuzzy_10x")(graft.operators.FuzzyJoin.selfJoin(
        bigCust, col("c_custkey"), col("c_name")))
    }
    if (ops("mmr")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
      def erep(k: Int) = emb.select(
        (col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
        // flip sign pattern per replica so replicas don't rank identically
        transform(col("embedding"),
          (x, i) => when(i % 10 === k % 10, -x).otherwise(x)).as("embedding"))
      val bigEmb = (0 until 10).map(erep).reduce(_ union _)
      val qs = emb.filter(col("vec_id") < 5)
      time("mmr_1x")(graft.operators.Similarity.mmrTopK(
        erep(0), qs, col("vec_id"), col("embedding"), k = 5, poolSize = 10))
      time("mmr_10x")(graft.operators.Similarity.mmrTopK(
        bigEmb, qs, col("vec_id"), col("embedding"), k = 5, poolSize = 10))
    }
    spark.stop()
  }
}
