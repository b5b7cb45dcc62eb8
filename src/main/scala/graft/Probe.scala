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
    // PROBE_JOBS=1: print every Spark job's wall (> 50 ms) — names whether
    // a query's exec time is few slow jobs or many fixed-latency ones
    if (sys.env.get("PROBE_JOBS").contains("1")) {
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobStart.put(js.jobId, System.nanoTime())
          override def onJobEnd(
              je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            Option(jobStart.remove(je.jobId)).foreach { t0 =>
              val sec = (System.nanoTime() - t0) / 1e9
              if (sec > 0.05) println(f"    job ${je.jobId}%4d $sec%6.2f s")
            }
        })
    }
    // PROBE_PLAN=1 prints the executed plan instead of timing;
    // PROBE_PLAN=fmt prints explain("formatted") (the plans/r18 artifacts)
    val planMode = sys.env.get("PROBE_PLAN")
    val planOnly = planMode.exists(m => m == "1" || m == "fmt")
    names.foreach { n =>
      if (planMode.contains("exec")) {
        // finalized ADAPTIVE plan: execute first, then print — names
        // whether AQE's runtime stage reuse (ReusedExchange) fired,
        // which the un-executed plan modes cannot show
        println(s"===== $n =====")
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.write.mode("overwrite").format("noop").save()
        val s = df.queryExecution.executedPlan.toString
        println("ReusedExchange: " + "ReusedExchange".r.findAllIn(s).size)
        println(s)
        spark.sharedState.cacheManager.clearCache()
        graft.operators.Dedup.unpersistIntermediates()
        graft.operators.Corpus.unpersistIntermediates()
        graft.operators.Graph.unpersistIntermediates()
      } else if (planOnly) {
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
        // split the timed region: DataFrame build (query-function eager
        // work + analysis), physical planning, execution — names whether
        // a query's wall is driver-side plan work or real job time
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        println(f"$n run$i: ${(t3 - t0) / 1e9}%.2f s " +
          f"(build ${(t1 - t0) / 1e9}%.2f, plan ${(t2 - t1) / 1e9}%.2f, " +
          f"exec ${(t3 - t2) / 1e9}%.2f)")
      }
    }
    spark.stop()
  }
}
