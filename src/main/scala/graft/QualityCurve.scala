package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument (VERDICT r16 task 3): the sampled-containment
  * estimator's quality KNOB CURVE — recall/precision/wall of
  * [[graft.operators.Dedup.containmentApproxPairs]] at several sample
  * sizes `k` against ONE shared exact-tier ground truth, the d21d
  * protocol (deterministic id-hash quarter sample, t = 0.7, df cap 50)
  * at whatever scale `sfDir` points at.
  *
  * d21d's standing oracle row pins a single point (k = 16); this main
  * produces the curve users actually trade along: estimator sd is
  * ~sqrt(c(1-c)/k), so doubling k should buy ~1/sqrt(2) of the
  * threshold-crossing noise at ~2x the probe volume. The exact tier is
  * computed once and persisted — each k pays only its own sample join
  * plus two count aggregations.
  *
  * Usage: runMain graft.QualityCurve [sfDir] [ks] [outPath]
  *   ks defaults to 8,16,32,64; outPath to tmp/quality_curve.json
  */
object QualityCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10adv")
    val ks = (if (args.length > 1) args(1) else "8,16,32,64")
      .split(",").map(_.trim.toInt).toSeq
    val outPath = if (args.length > 2) args(2) else "tmp/quality_curve.json"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "320"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the d21d protocol verbatim (PipelineQueries.D21dSample*): MINSTD
    // keyed quarter-sample, n=3 shingles, t=0.7, index-side df cap 50
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(graft.functions.KeyedHash.idHash(col("doc_id"), 48271L)
        % 1000000L < 250000L)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val exact = graft.operators.Dedup.containmentPairs(
      docs, col("doc_id"), col("text"), n = 3,
      minContainmentPpm = 700000L, maxDocFreq = 50)
      .select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (nExact, exactWall) = timed(exact.count())
    println(f"exact tier: $nExact pairs in $exactWall%.1f s")

    val rows = ks.map { k =>
      // fresh operator caches per k: each point pays its own shingle
      // tokenize + sample join, none inherits a prior k's persisted
      // intermediates (the exact tier above is the ONE shared input)
      graft.operators.Dedup.unpersistIntermediates(blocking = true)
      val ((nApprox, nBoth), wall) = timed {
        val ap = graft.operators.Dedup.containmentApproxPairs(
          docs, col("doc_id"), col("text"), n = 3, k = k,
          minContainmentPpm = 700000L, maxDocFreq = 50)
          .select("doc_a", "doc_b")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nA = ap.count()
        val nB = exact.join(ap, Seq("doc_a", "doc_b")).count()
        ap.unpersist(blocking = true)
        (nA, nB)
      }
      val recall = if (nExact > 0) nBoth.toDouble / nExact else -1.0
      val precision = if (nApprox > 0) nBoth.toDouble / nApprox else -1.0
      println(f"k=$k%-3d approx=$nApprox both=$nBoth recall=$recall%.4f " +
        f"precision=$precision%.4f wall=$wall%.1f s")
      s""""$k":{"n_approx":$nApprox,"n_both":$nBoth,"recall":$recall,"precision":$precision,"wall_s":$wall}"""
    }
    val json =
      s"""{"protocol":"d21d quarter-sample (idHash MINSTD %1e6 < 250000), n=3, t=0.7, cap=50","sf":"$sfDir","shufflePartitions":"${spark.conf.get("spark.sql.shuffle.partitions")}","exact":{"n_pairs":$nExact,"wall_s":$exactWall},"ks":{${rows.mkString(",")}}}"""
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
