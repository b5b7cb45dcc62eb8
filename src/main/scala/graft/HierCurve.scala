package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev instrument (r18): the HIERARCHICAL tier's recall over the mass
  * budget — the curve behind s37. The round-close gate showed fixed hier
  * (sProbe=2, nProbe=2) reads the SAME 0.56 on the adversarial shape as
  * fixed flat IVF (§16c's failure, one level up), and s37's two-level
  * budget lifts it to 0.86 at 15% mass where flat-adaptive (s32) reads
  * 1.00. This instrument measures whether the residual gap is the BUDGET
  * (closes as massPpm rises) or the hier FILING itself (a ceiling no
  * budget can cross, the s26 assignment-fidelity trade): s37 swept over
  * massPpm, with the s19 fixed grid and s32 flat-adaptive as the floor
  * and ceiling references, walls included.
  *
  * Run on BOTH `tmp/sf10advemb` (clustered) and `tmp/sf10` (uniform) —
  * a default must hold on the realistic shape without regressing the
  * uniform one.
  *
  * Usage: runMain graft.HierCurve [sfDir] [outPath] [massPpms]
  *          [buildSProbe]
  */
object HierCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10advemb")
    val outPath = if (args.length > 1) args(1) else "tmp/hier_curve.json"
    val massPpms = (if (args.length > 2) args(2)
      else "50000,100000,150000,250000,400000")
      .split(",").map(_.trim.toLong).toSeq
    val buildSProbe = if (args.length > 3) args(3).toInt else 2
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

    // fixed hier grid: the knobs a user would raise by hand
    val fixedRows = Seq((2, 2), (2, 8), (4, 8), (8, 32)).map {
      case (sp, np) =>
        val (rec, w) = timed(meanRecall(Similarity.ivfTopKHierarchical(
          emb, queries, id, v, k = 10, centroidStride = 50, nProbe = np,
          superStride = 16, sProbe = sp)))
        println(f"s19 fixed sProbe=$sp nProbe=$np: $rec ppm ($w%.1f s)")
        s""""s19_sp${sp}_np$np":{"recall_ppm":$rec,"wall_s":$w}"""
    }
    // s37 over the mass budget (build side pinned at the s19 geometry)
    val adaptRows = massPpms.map { mp =>
      val (rec, w) = timed(meanRecall(Similarity.ivfTopKHierarchicalAdaptive(
        emb, queries, id, v, k = 10, centroidStride = 50, superStride = 16,
        sProbe = buildSProbe, massPpm = mp)))
      println(f"s37 buildSProbe=$buildSProbe massPpm=$mp: $rec ppm ($w%.1f s)")
      s""""s37_sp${buildSProbe}_mass$mp":{"recall_ppm":$rec,"wall_s":$w}"""
    }
    // the flat-adaptive ceiling at the pinned 15%
    val (s32r, s32w) = timed(meanRecall(Similarity.ivfTopKAdaptive(
      emb, queries, id, v, k = 10, centroidStride = 50, massPpm = 150000L)))
    println(f"s32 flat adaptive 15%%: $s32r ppm ($s32w%.1f s)")

    val json = s"""{"sf":"$sfDir","k":10,"n_queries":5,""" +
      (fixedRows ++ adaptRows :+
        s""""s32_flat_mass150000":{"recall_ppm":$s32r,"wall_s":$s32w}""")
        .mkString(",") + "}"
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(json) finally w.close()
    println(s"wrote $outPath")
    spark.stop()
  }
}
