package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time named SparkEntry queries in isolation.
  * Usage: runMain graft.Probe <sfDir> <query...>   (2 runs each)
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // PROBE_PLAN=1 prints the executed plan instead of timing;
    // PROBE_PLAN=fmt prints explain("formatted") (the plans/r18 artifacts)
    val planMode = sys.env.get("PROBE_PLAN")
    val planOnly = planMode.exists(m => m == "1" || m == "fmt")
    names.foreach { n =>
      if (planOnly) {
        println(s"===== $n =====")
        val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
        if (planMode.contains("fmt"))
          println(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        else println(qe.executedPlan.toString)
        // building a plan can eagerly run + persist operator intermediates
        // (cluster convergence loops, epoch ranking); drop them so a later
        // query's printed plan can't silently reuse an earlier query's cache
        spark.sharedState.cacheManager.clearCache()
        graft.operators.Dedup.unpersistIntermediates()
        graft.operators.Corpus.unpersistIntermediates()
        graft.operators.Graph.unpersistIntermediates()
      } else (1 to 2).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
