package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DryRunInc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val inc = docs.filter(col("doc_id") % 5 === 0) // fixed 1k-doc batch
    val store1 = docs.filter(col("doc_id") % 5 =!= 0)
    // 10x store: disjoint ids, per-replica suffix (base dup density, no
    // cross-replica identity)
    val store10 = (0 until 10).map(r =>
      store1.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" r$r")).as("text"))).reduce(_ union _)
    def run(tag: String, store: org.apache.spark.sql.DataFrame): Unit = {
      // persist the signature store like a real deployment (built once,
      // not part of the per-batch cost)
      val sig = graft.operators.Dedup.minhashStore(store, col("doc_id"), col("text"),
        n = 3, numHashes = 32)
      sig.write.mode("overwrite").parquet(s"/tmp/dry_inc/$tag.parquet")
      val stored = spark.read.parquet(s"/tmp/dry_inc/$tag.parquet")
      (1 to 2).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        graft.operators.Dedup.unpersistIntermediates()
        val t0 = System.nanoTime()
        graft.operators.Dedup.incrementalDedup(inc, stored, col("doc_id"), col("text"),
          n = 3, numHashes = 32, bands = 4, minAgree = 16)
          .write.mode("overwrite").format("noop").save()
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    run("store1x", store1)
    run("store10x", store10)
    spark.stop()
  }
}
