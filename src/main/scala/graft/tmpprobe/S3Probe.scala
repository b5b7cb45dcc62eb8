package graft.tmpprobe
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object S3Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "320")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        println(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%4d " +
          f"runtime=${si.taskMetrics.executorRunTime / 1000.0}%8.1fs " +
          f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%8.1fs  ${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf10")
    def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def qual = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    def assign(cents: DataFrame): DataFrame =
      graft.operators.Similarity.ivfAssign(
        emb, col("vec_id"), col("embedding"), centroids = Some(cents))
    def run(tag: String, df: => DataFrame): Unit = {
      println(s"--- $tag")
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"  $tag total: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    run("warm-filter", assign(qual.filter(col("c_id") < 12800L)))
    run("filter", assign(qual.filter(col("c_id") < 12800L)))
    run("rank", assign(qual.orderBy(col("c_id")).limit(256)))
    spark.stop()
  }
}
