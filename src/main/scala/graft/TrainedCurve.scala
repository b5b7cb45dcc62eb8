package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev instrument (r18): does TRAINING the coarse quantizer make the
  * mass budget unnecessary? Two competing readings of §16c: (a) the
  * stride quantizer's failure was mis-ALIGNMENT — k-means lists follow
  * the clusters, a query's own list holds its neighbors, fixed nProbe
  * is fine; (b) the failure is the MASS variance itself — Zipf cluster
  * masses make a fixed probe count read wildly different corpus
  * fractions per query, trained or not. Measured: k-means quantizers at
  * two k on the adversarial corpus (and uniform as control), fixed
  * nProbe ∈ {1, 2, 4} vs the mass budget at 5% / 15%, one shared exact
  * ground truth — the row that decides the deployment guidance for
  * s39's composition.
  *
  * Usage: runMain graft.TrainedCurve [sfDir] [outPath] [ks]
  */
object TrainedCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10advemb")
    val outPath = if (args.length > 1) args(1) else "tmp/trained_curve.json"
    val ks = (if (args.length > 2) args(2) else "32")
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
    def meanRecall(approx: DataFrame): Long = {
      val r = Similarity.recallAtK(exact, approx, k = 10)
        .agg(avg(col("recall_ppm"))).collect()(0)
      math.round(r.getDouble(0))
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val rows = ks.flatMap { k =>
      val cents = Similarity.kmeansCentroids(
        Similarity.kmeansTrain(emb, id, v, k = k, iters = 2,
          seedStride = 50, rankSeeds = true))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cents.count()
      val fixed = Seq(1, 2, 4).map { np =>
        val (rec, w) = timed(meanRecall(Similarity.ivfTopK(emb, queries,
          id, v, k = 10, nProbe = np, centroids = Some(cents))))
        println(f"trained k=$k fixed nProbe=$np: $rec ppm ($w%.1f s)")
        s""""k${k}_fixed_np$np":{"recall_ppm":$rec,"wall_s":$w}"""
      }
      val adapt = Seq(50000L, 150000L).map { mp =>
        val (rec, w) = timed(meanRecall(Similarity.ivfTopKAdaptive(emb,
          queries, id, v, k = 10, massPpm = mp, centroids = Some(cents))))
        println(f"trained k=$k adaptive massPpm=$mp: $rec ppm ($w%.1f s)")
        s""""k${k}_adaptive_mass$mp":{"recall_ppm":$rec,"wall_s":$w}"""
      }
      fixed ++ adapt
    }
    val json = s"""{"sf":"$sfDir","k":10,"n_queries":5,""" +
      rows.mkString(",") + "}"
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
