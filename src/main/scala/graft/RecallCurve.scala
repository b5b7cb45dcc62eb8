package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev instrument (VERDICT r16 task 2): the ANN recall contracts measured
  * on an arbitrary embeddings corpus — built to re-take the standing
  * recall numbers (pinned on the stride-synthetic near-uniform testdata)
  * on the ADVERSARIAL clustered/anisotropic corpus (`ScaleUp
  * mode=advemb`), where IVF recall actually degrades.
  *
  * Measures, against one shared exact brute-force ranking (the s1 oracle,
  * 5 query vectors, k = 10):
  *  - flat IVF (s3/s17 config: stride 50, cap 256) recall per nProbe —
  *    the knob users raise when lists are imbalanced;
  *  - hierarchical IVF (s19/s21 config: superStride 16, sProbe 2) recall
  *    per nProbe;
  *  - IVF×PQ flat (s14/s18) and hierarchical (s20/s22) at their pinned
  *    nProbe=2 configs;
  *  - the s26 assignment-agreement curve (sProbe ∈ 1,2,4).
  *
  * Usage: runMain graft.RecallCurve [sfDir] [outPath] [nProbes]
  */
object RecallCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10advemb")
    val outPath = if (args.length > 1) args(1) else "tmp/recall_curve.json"
    val nProbes = (if (args.length > 2) args(2) else "1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5) // the suite's queriesDf
    val id = col("vec_id"); val v = col("embedding")

    val exact = Similarity.bruteForceTopK(emb, queries, id, v, k = 10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()

    // mean recall_ppm over the query set (5 rows — collect is bounded)
    def meanRecall(approx: DataFrame): Long = {
      val r = Similarity.recallAtK(exact, approx, k = 10)
        .agg(avg(col("recall_ppm"))).collect()(0)
      math.round(r.getDouble(0))
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val flat = nProbes.map { np =>
      val (rec, w) = timed(meanRecall(Similarity.ivfTopK(emb, queries, id, v,
        k = 10, centroidStride = 50, nProbe = np)))
      println(f"ivf flat nProbe=$np%-3d recall_ppm=$rec wall=$w%.1f s")
      s""""$np":{"recall_ppm":$rec,"wall_s":$w}"""
    }
    val hier = nProbes.map { np =>
      val (rec, w) = timed(meanRecall(Similarity.ivfTopKHierarchical(
        emb, queries, id, v, k = 10, centroidStride = 50, nProbe = np,
        maxCentroids = 256, superStride = 16, sProbe = 2)))
      println(f"ivf hier nProbe=$np%-3d recall_ppm=$rec wall=$w%.1f s")
      s""""$np":{"recall_ppm":$rec,"wall_s":$w}"""
    }
    val adaptive = Seq(30000L, 100000L, 150000L, 300000L).map { m =>
      val (rec, w) = timed(meanRecall(Similarity.ivfTopKAdaptive(emb, queries,
        id, v, k = 10, centroidStride = 50, massPpm = m)))
      println(f"ivf adaptive massPpm=$m%-7d recall_ppm=$rec wall=$w%.1f s")
      s""""$m":{"recall_ppm":$rec,"wall_s":$w}"""
    }
    val (pqFlat, wPqF) = timed(meanRecall(Similarity.ivfPqTopK(emb, queries,
      id, v, k = 10, centroidStride = 50, nProbe = 2, numSubspaces = 8,
      numCodes = 16, codeStride = 16, pool = 50)))
    println(s"ivfpq flat nProbe=2 recall_ppm=$pqFlat")
    val (pqHier, wPqH) = timed(meanRecall(Similarity.ivfPqTopK(emb, queries,
      id, v, k = 10, centroidStride = 50, nProbe = 2, numSubspaces = 8,
      numCodes = 16, codeStride = 16, pool = 50, hierarchical = true,
      superStride = 16, sProbe = 2)))
    println(s"ivfpq hier nProbe=2 recall_ppm=$pqHier")

    // the s26 agreement curve: ppm of rows whose two-level centroid
    // equals the flat argmax, per sProbe (3 rows — bounded collect)
    val agree = Similarity.assignmentAgreement(emb, id, v,
      Similarity.coarseCentroids(emb, id, v, centroidStride = 50,
        maxCentroids = 256),
      superStride = 16, sProbes = Seq(1, 2, 4))
      .orderBy("s_probe").collect()
      .map(r => s""""${r.getAs[Any]("s_probe")}":${r.getAs[Any]("agree_ppm")}""")
    println(s"s26 agreement: ${agree.mkString(", ")}")

    val json =
      s"""{"sf":"$sfDir","k":10,"n_queries":5,"ivf_flat_by_nprobe":{${flat.mkString(",")}},"ivf_hier_sprobe2_by_nprobe":{${hier.mkString(",")}},"ivf_adaptive_by_massppm":{${adaptive.mkString(",")}},"ivfpq_flat_nprobe2":{"recall_ppm":$pqFlat,"wall_s":$wPqF},"ivfpq_hier_nprobe2":{"recall_ppm":$pqHier,"wall_s":$wPqH},"s26_agree_ppm_by_sprobe":{${agree.mkString(",")}}}"""
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
