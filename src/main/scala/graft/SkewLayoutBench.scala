package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev instrument (r18): the store WRITER layout under Zipf list masses
  * — the A/B behind the mass-proportional auto route. Arm A emulates the
  * r17 rule (one global `ceil((inputBytes / lists) / target)` count for
  * every list — passed explicitly, since the code now routes per list);
  * arm B is the r18 auto route (per-list `ceil(listBytes / target)` from
  * the 1/64 hash-sample estimate). Measured per arm: build wall, file
  * count, and the file-size distribution (max / p99 / share of bytes in
  * files over 2× target) — the straggler-and-oversize signature the
  * global mean produces on a clustered corpus, where the heaviest
  * list's share of the corpus lands in `globalCount` files sized
  * `share × lists ×` the target.
  *
  * Run on `tmp/sf10advemb` (Zipf masses) and `tmp/sf10` (uniform — the
  * two rules should coincide there, the control). With `trainedK` set,
  * the store is built over K-MEANS-TRAINED centroids instead of stride
  * picks: lists then align with the corpus's CLUSTERS, so per-list
  * masses inherit the full Zipf cluster masses (§16c: 24% → 0.7%)
  * instead of diluting across dozens of stride lists — the shape where
  * the global rule's miss is largest.
  *
  * Usage: runMain graft.SkewLayoutBench [sfDir] [outPath] [targetBytes]
  *          [trainedK]
  */
object SkewLayoutBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10advemb")
    val outPath = if (args.length > 1) args(1) else "tmp/skew_layout.json"
    val target = if (args.length > 2) args(2).toLong else 2L << 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.VectorIndex
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val id = col("vec_id"); val v = col("embedding")
    val trainedK = if (args.length > 3) Some(args(3).toInt) else None
    val trained = trainedK.map { k =>
      graft.operators.Similarity.kmeansCentroids(
        graft.operators.Similarity.kmeansTrain(emb, id, v, k = k,
          iters = 2, seedStride = 50, rankSeeds = true))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    trained.foreach(_.count())

    // the r17 global count, recomputed the way autoFilesPerList did:
    // plan-stats bytes over the list count over the target
    val stats = emb.queryExecution.optimizedPlan.stats.sizeInBytes
    val nLists = trainedK.map(_.toLong).getOrElse(math.min(
      emb.filter(col("vec_id") % 50 === 0).count(), 256L))
    val globalFpl = ((stats / BigInt(math.max(nLists, 1L)) + target - 1)
      / target).max(1).min(4096).toInt

    def measure(name: String, build: String => Unit): String = {
      val path = s"/root/repo/tmp/stores/skewlayout_$name"
      val dir = new java.io.File(path)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      if (dir.exists()) rm(dir)
      val t0 = System.nanoTime()
      build(path)
      val wall = (System.nanoTime() - t0) / 1e9
      val files = VectorIndex.listManifest(spark, path)
        .select(col("bytes")).as[Long].collect().sorted
      val total = files.sum.toDouble
      val over2x = files.filter(_ > 2L * target).sum.toDouble
      val p99 = files((files.length * 99) / 100 min (files.length - 1))
      println(f"$name: wall $wall%.1f s, ${files.length} files, " +
        f"max ${files.max / 1e6}%.1f MB, p99 ${p99 / 1e6}%.1f MB, " +
        f"oversized-bytes share ${over2x / total}%.2f")
      s""""$name":{"wall_s":$wall,"files":${files.length},""" +
        s""""max_bytes":${files.max},"p99_bytes":$p99,""" +
        s""""oversized_byte_share_ppm":${math.round(over2x / total * 1e6)}}"""
    }

    // unrecorded warmup build so arm A does not pay JVM/codegen warmup
    measure("warmup", p => VectorIndex.writeIvfIndex(
      emb.filter(col("vec_id") % 16 === 0), id, v, p,
      hierarchical = false, targetFileBytes = target,
      centroids = trained))
    val a = measure("r17_global", p => VectorIndex.writeIvfIndex(
      emb, id, v, p, hierarchical = false, filesPerList = globalFpl,
      targetFileBytes = target, centroids = trained))
    val b = measure("r18_perlist", p => VectorIndex.writeIvfIndex(
      emb, id, v, p, hierarchical = false, targetFileBytes = target,
      centroids = trained))
    // the maintenance path: arm A's store right-sized by split-compact
    val t0 = System.nanoTime()
    val plan = VectorIndex.compactIvfIndex(spark,
      "/root/repo/tmp/stores/skewlayout_r17_global", targetBytes = target)
    val planned = plan.select(col("c_id")).distinct().count()
    val compactWall = (System.nanoTime() - t0) / 1e9
    val after = VectorIndex.listManifest(spark,
        "/root/repo/tmp/stores/skewlayout_r17_global")
      .select(col("bytes")).as[Long].collect()
    println(f"split-compact of r17_global: $planned lists rewritten in " +
      f"$compactWall%.1f s, max file now ${after.max / 1e6}%.1f MB")

    val json = s"""{"sf":"$sfDir","target_bytes":$target,""" +
      s""""trained_k":${trainedK.getOrElse(0)},""" +
      s""""global_fpl":$globalFpl,$a,$b,""" +
      s""""split_compact":{"wall_s":$compactWall,"lists":$planned,""" +
      s""""max_bytes_after":${after.max}}}"""
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
