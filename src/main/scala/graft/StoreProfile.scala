package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorIndex

/** Dev instrument: stage-at-a-time wall profile of the s25/s28 store
  * flows (build → append → [compact] → probe) — names where the
  * multi-second store walls actually go (write? sizes read-back? probe?)
  * before any store-side optimization is attempted (guide §1.1).
  *
  * Usage: runMain graft.StoreProfile [sfDir] [reps]
  */
object StoreProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall breakdown: job id, seconds, and the first line of the
    // active SQL description — names which of a step's sequential Spark
    // jobs carries its wall
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobStart.put(js.jobId, (System.nanoTime(), desc.take(70)))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(je.jobId)).foreach { case (t0, desc) =>
            val sec = (System.nanoTime() - t0) / 1e9
            if (sec > 0.05)
              println(f"      job ${je.jobId}%4d ${sec}%6.2f s  $desc")
          }
        }
      })
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val queries = emb.filter(col("vec_id") < 5)
    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      val path = s"/tmp/store_profile/ivf_$rep"
      timeIt("build (%7!=0)") {
        VectorIndex.writeIvfIndex(emb.filter(col("vec_id") % 7 =!= 0),
          col("vec_id"), col("embedding"), path, hierarchical = true)
      }
      timeIt("append (%7==0)") {
        VectorIndex.appendToIvfIndex(emb.filter(col("vec_id") % 7 === 0),
          col("vec_id"), col("embedding"), path)
      }
      timeIt("compact") {
        VectorIndex.compactIvfIndex(spark, path)
          .write.mode("overwrite").format("noop").save()
      }
      timeIt("probe k=10 nProbe=2") {
        VectorIndex.probeIvfIndex(spark, path, queries, col("vec_id"),
          col("embedding"), k = 10, nProbe = 2)
          .write.mode("overwrite").format("noop").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
