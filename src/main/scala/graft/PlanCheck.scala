package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "320")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("tmp/sf10/embeddings.parquet")
    (1 to 2).foreach { i =>
      val cents = operators.Similarity.coarseCentroids(emb, col("vec_id"), col("embedding"), 50, 256)
      var t0 = System.nanoTime()
      val assigned = operators.Similarity.ivfAssignHierarchical(emb, col("vec_id"), col("embedding"), cents, 16, 2)
      assigned.write.mode("overwrite").format("noop").save()
      println(f"run$i assign-only: ${(System.nanoTime()-t0)/1e9}%.1f s")
      t0 = System.nanoTime()
      operators.VectorIndex.writeIvfIndex(emb, col("vec_id"), col("embedding"),
        "tmp/stores/plancheck_probe", hierarchical = true)
      println(f"run$i full build: ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    spark.stop()
  }
}
