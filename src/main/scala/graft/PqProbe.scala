package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev instrument (round 17, follow-up to the advemb finding): the PQ
  * tiers' ADC estimate is squared L2 in RAW vector space
  * (`PqLut` scaladoc), while the tier's contract is COSINE top-k —
  * rank-equivalent only when norms are near-uniform. The adversarial
  * embeddings corpus (varying norms by construction) collapses IVF×PQ
  * recall to 0.04 while every non-PQ tier holds. The textbook remedy for
  * cosine-PQ is to UNIT-NORMALIZE before encoding (then raw L2² =
  * 2 − 2·cos is rank-equivalent to cosine everywhere). This probe
  * measures exactly that, operator-unchanged: the same `ivfPqTopK`
  * call over pre-unitized copies of base+queries, against the exact
  * cosine ranking of the ORIGINAL vectors (unitizing never changes the
  * cosine ranking, so the ground truth is the same contract).
  *
  * Usage: runMain graft.PqProbe [sfDir] [outPath]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10advemb")
    val outPath = if (args.length > 1) args(1) else "tmp/pq_probe.json"
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
    val unitized = emb.withColumn("embedding",
      transform(col("embedding"), x => (x / sqrt(greatest(
        aggregate(col("embedding"), lit(0.0d), (a, y) => a + y * y),
        lit(1e-12d)))).cast("float")))
    def queriesOf(df: DataFrame) = df.filter(col("vec_id") < 5)
    val id = col("vec_id"); val v = col("embedding")

    val exact = Similarity.bruteForceTopK(emb, queriesOf(emb), id, v, k = 10)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()

    def meanRecall(approx: DataFrame): Long = math.round(
      Similarity.recallAtK(exact, approx, k = 10)
        .agg(avg(col("recall_ppm"))).collect()(0).getDouble(0))

    def pq(df: DataFrame, hier: Boolean, pool: Int = 50,
        cb: Option[Array[Array[Array[Double]]]] = None): Long = meanRecall(
      Similarity.ivfPqTopK(df, queriesOf(df), id, v, k = 10,
        centroidStride = 50, nProbe = 2, numSubspaces = 8, numCodes = 16,
        codeStride = 16, pool = pool, hierarchical = hier,
        superStride = 16, sProbe = 2, codebook = cb))

    // remedy arms: trained per-subspace Lloyd codebook (the operator's
    // documented production path) and a widened ADC pool, vs the
    // stride-sampled default that collapses on clustered data
    val trained = Similarity.pqTrainCodebook(emb, id, v,
      numSubspaces = 8, numCodes = 16, iters = 2, seedStride = 16)
    val rows = Seq(
      "raw_flat" -> pq(emb, hier = false),
      "raw_hier" -> pq(emb, hier = true),
      "unit_flat" -> pq(unitized, hier = false),
      "unit_hier" -> pq(unitized, hier = true),
      "raw_flat_pool500" -> pq(emb, hier = false, pool = 500),
      "trained_flat" -> pq(emb, hier = false, cb = Some(trained)),
      "trained_hier" -> pq(emb, hier = true, cb = Some(trained)),
      "trained_flat_pool500" -> pq(emb, hier = false, pool = 500,
        cb = Some(trained)),
      "residual_flat" -> meanRecall(Similarity.ivfPqTopK(emb, queriesOf(emb),
        id, v, k = 10, centroidStride = 50, nProbe = 2, numSubspaces = 8,
        numCodes = 16, codeStride = 16, pool = 50, residual = true)),
      "residual_hier" -> meanRecall(Similarity.ivfPqTopK(emb, queriesOf(emb),
        id, v, k = 10, centroidStride = 50, nProbe = 2, numSubspaces = 8,
        numCodes = 16, codeStride = 16, pool = 50, hierarchical = true,
        superStride = 16, sProbe = 2, residual = true)),
      // the faiss-standard shape: 8-bit codes (256 cells/subspace) plus
      // residual encoding, at the default pool and at a widened one
      "residual256_flat" -> meanRecall(Similarity.ivfPqTopK(emb,
        queriesOf(emb), id, v, k = 10, centroidStride = 50, nProbe = 2,
        numSubspaces = 8, numCodes = 256, codeStride = 7, pool = 50,
        residual = true)),
      "residual256_flat_pool500" -> meanRecall(Similarity.ivfPqTopK(emb,
        queriesOf(emb), id, v, k = 10, centroidStride = 50, nProbe = 2,
        numSubspaces = 8, numCodes = 256, codeStride = 7, pool = 500,
        residual = true)),
      "raw256_flat" -> meanRecall(Similarity.ivfPqTopK(emb, queriesOf(emb),
        id, v, k = 10, centroidStride = 50, nProbe = 2, numSubspaces = 8,
        numCodes = 256, codeStride = 7, pool = 50)))
    rows.foreach { case (n, r) => println(f"pq $n%-10s recall_ppm=$r") }
    val json = s"""{"sf":"$sfDir","k":10,"nProbe":2,"pool":50,${rows
      .map { case (n, r) => s""""$n":$r""" }.mkString(",")}}"""
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
