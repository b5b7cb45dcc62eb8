package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev instrument (VERDICT r17 task 1): the ADAPTIVE RESCORE POOL's
  * recall/wall curve — §16c measured the pool, not the codebook, as the
  * binding knob for IVF×PQ on clustered corpora (recall 0.04 at pool=50,
  * 0.38 even at pool=500), and s32's mass budget fixed only the nProbe
  * half. This instrument measures the other half: `ivfPqTopK` with the
  * probe mass budget pinned at s32's 15% and the rescore pool scaled to
  * each query's probed candidate count (`poolPpm`), swept over the pool
  * fraction, on an arbitrary corpus (run on BOTH `tmp/sf10advemb` and
  * `tmp/sf10` — a pool default must hold on the clustered shape without
  * regressing the uniform one).
  *
  * Also rows for: the fixed-knob s31 config (residual, nProbe=2,
  * pool=50 — the collapse being fixed), the non-residual adaptive
  * control at the chosen fraction (does residual still matter once the
  * pool scales?), and the persisted-store adaptive probe
  * ([[graft.operators.VectorIndex.probeIvfIndexAdaptive]], task 2's
  * steady-state path) timed at build-amortized steady state.
  *
  * Usage: runMain graft.PoolCurve [sfDir] [outPath] [poolPpms]
  */
object PoolCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10advemb")
    val outPath = if (args.length > 1) args(1) else "tmp/pool_curve.json"
    val poolPpms = (if (args.length > 2) args(2)
      else "25000,50000,100000,250000,500000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Similarity, VectorIndex}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5) // the suite's queriesDf
    val id = col("vec_id"); val v = col("embedding")

    val exact = Similarity.bruteForceTopK(emb, queries, id, v, k = 10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()

    def meanRecall(approx: DataFrame): Long = {
      val r = Similarity.recallAtK(exact, approx, k = 10)
        .agg(avg(col("recall_ppm"))).collect()(0)
      math.round(r.getDouble(0))
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // the fixed-knob reference being fixed: s31's residual config
    val (fixed, wFixed) = timed(meanRecall(Similarity.ivfPqTopK(emb, queries,
      id, v, k = 10, centroidStride = 50, nProbe = 2, numSubspaces = 8,
      numCodes = 16, codeStride = 16, pool = 50, residual = true)))
    println(f"fixed s31 (residual, nProbe=2, pool=50): recall_ppm=$fixed wall=$wFixed%.1f s")

    val curve = poolPpms.map { pp =>
      val (rec, w) = timed(meanRecall(Similarity.ivfPqTopK(emb, queries,
        id, v, k = 10, centroidStride = 50, numSubspaces = 8,
        numCodes = 16, codeStride = 16, residual = true,
        massPpm = Some(150000L), poolPpm = Some(pp))))
      println(f"adaptive residual mass=15%% poolPpm=$pp%-7d recall_ppm=$rec wall=$w%.1f s")
      s""""$pp":{"recall_ppm":$rec,"wall_s":$w}"""
    }

    // non-residual control at the s33 fraction: once the pool scales,
    // how much of the remaining recall is the residual encoding's?
    val (nores, wNores) = timed(meanRecall(Similarity.ivfPqTopK(emb, queries,
      id, v, k = 10, centroidStride = 50, numSubspaces = 8,
      numCodes = 16, codeStride = 16, residual = false,
      massPpm = Some(150000L), poolPpm = Some(250000L))))
    println(f"adaptive RAW mass=15%% poolPpm=250000: recall_ppm=$nores wall=$wNores%.1f s")

    // the steady-state store path (task 2): build once (timed apart),
    // then the adaptive probe's own wall — the s24-band claim
    val store = s"${sys.env.getOrElse("SPARK_GRAFT_STORE_DIR",
      "/root/repo/tmp/stores")}/poolcurve_flat_v${VectorIndex.FormatVersion}"
    val (_, wBuild) = timed(VectorIndex.writeIvfIndex(emb, id, v, store,
      hierarchical = false))
    val (storeRec, wProbe) = timed(meanRecall(
      VectorIndex.probeIvfIndexAdaptive(spark, store, queries, id, v,
        k = 10, massPpm = 150000L)))
    println(f"store adaptive probe: recall_ppm=$storeRec build=$wBuild%.1f s probe=$wProbe%.1f s")

    // the residual-PQ store under BOTH adaptive knobs (s35's config) —
    // the codes-only candidate scan is the steady-state 100 TB seller
    val pqStore = s"${sys.env.getOrElse("SPARK_GRAFT_STORE_DIR",
      "/root/repo/tmp/stores")}/poolcurve_pqr_v${VectorIndex.FormatVersion}"
    val (_, wBuildPq) = timed(VectorIndex.writeIvfIndex(emb, id, v, pqStore,
      hierarchical = false, pq = true, pqResidual = true))
    val (pqRec, wProbePq) = timed(meanRecall(
      VectorIndex.probeIvfPqIndex(spark, pqStore, queries, id, v, k = 10,
        massPpm = Some(150000L), poolPpm = Some(500000L))))
    println(f"pq-residual store adaptive probe: recall_ppm=$pqRec " +
      f"build=$wBuildPq%.1f s probe=$wProbePq%.1f s")

    val json =
      s"""{"sf":"$sfDir","k":10,"n_queries":5,"mass_ppm":150000,"fixed_s31_residual_np2_pool50":{"recall_ppm":$fixed,"wall_s":$wFixed},"adaptive_residual_by_poolppm":{${curve.mkString(",")}},"adaptive_raw_poolppm250000":{"recall_ppm":$nores,"wall_s":$wNores},"store_adaptive_probe":{"recall_ppm":$storeRec,"build_s":$wBuild,"probe_s":$wProbe},"pqres_store_adaptive_probe":{"recall_ppm":$pqRec,"build_s":$wBuildPq,"probe_s":$wProbePq}}"""
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
