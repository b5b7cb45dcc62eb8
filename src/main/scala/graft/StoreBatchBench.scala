package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument (r18): the serving-batch trade behind s38 — on a
  * persisted store, the flat-ranked adaptive probe pays
  * `|queries| × lists` assignment dots while the two-level probe pays
  * `|queries| × (lists/superStride + probed-supers' centroids)`; for
  * config-sized batches both are noise, for serving-scale batches the
  * assignment stage dominates the budget-bounded scan. Measured: a 1%
  * query batch (2 000 queries at the 200k copy) probed both ways at the
  * pinned 15% budget, median-of-3 walls after one warmup, plus the
  * config-sized 5-query batch as the contrast (where the two probes
  * should tie). Recall is NOT re-measured here — store-vs-inflight
  * bit-identity is spec-pinned, and the in-flight tiers' recall is
  * BASELINE §17d's table (flat 1.00 / hier 0.96–0.98 at 15%).
  *
  * Usage: runMain graft.StoreBatchBench [sfDir] [outPath] [batch]
  *          [massPpm]
  */
object StoreBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10advemb")
    val outPath = if (args.length > 1) args(1) else "tmp/store_batch.json"
    val batch = if (args.length > 2) args(2).toInt else 2000
    val massPpm = if (args.length > 3) args(3).toLong else 150000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.VectorIndex

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val id = col("vec_id"); val v = col("embedding")
    val path = "/root/repo/tmp/stores/batchbench_hier"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(path))
    VectorIndex.writeIvfIndex(emb, id, v, path) // s37 geometry defaults

    def wall(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0, "probe returned no rows")
      (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Long): Double = {
      wall(f) // warmup
      Seq.fill(3)(wall(f)).sorted.apply(1)
    }
    def probe(flat: Boolean, nQ: Int): Long = {
      val qs = emb.filter(col("vec_id") < nQ)
      val df =
        if (flat) VectorIndex.probeIvfIndexAdaptive(spark, path, qs, id, v,
          k = 10, massPpm = massPpm)
        else VectorIndex.probeIvfIndexHierAdaptive(spark, path, qs, id, v,
          k = 10, massPpm = massPpm)
      df.count()
    }
    val rows = for {
      nQ <- Seq(5, batch)
      flat <- Seq(true, false)
    } yield {
      val w = median3(probe(flat, nQ))
      val name = s"${if (flat) "flat" else "twolevel"}_q$nQ"
      println(f"$name: $w%.2f s")
      s""""$name":{"wall_s":$w}"""
    }
    val json = s"""{"sf":"$sfDir","batch":$batch,"mass_ppm":$massPpm,""" +
      rows.mkString(",") + "}"
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
