package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev instrument: stage-at-a-time wall profile of the PPJoin prefix
  * machinery behind d16/d19/d21x/d22 — names whether the wall is the
  * ranked-prefix computation (df agg + join + window, computed once per
  * SIDE of the self-join), the candidate join + distinct, or the
  * full-set array_intersect verify (guide §1.1).
  *
  * Usage: runMain graft.PrefixProfile [sfDir] [reps]
  */
object PrefixProfile {
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
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    def timeIt[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val minJaccardPpm = 500000L
    (1 to reps).foreach { rep =>
      println(s"=== rep $rep ===")
      // replicate prefixJaccardPairs' internals stage by stage
      val base = docs
        .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist()
      timeIt("base materialize")(noop(base))
      val sh = base.select(col("doc_id"), size(col("sh")).as("n_sh"),
        explode(col("sh")).as("s"))
      timeIt("postings explode")(noop(sh))
      val dfs = sh.select("s").groupBy("s").agg(count(lit(1)).as("df"))
      timeIt("df agg")(noop(dfs))
      val ranked = sh.join(dfs, Seq("s"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)))
      val prefix = ranked.filter(
        col("rk") <= col("n_sh") -
          expr(s"(n_sh * $minJaccardPpm + 999999) div 1000000") + 1)
        .select(col("doc_id"), col("s"), col("n_sh"), col("rk"))
      timeIt("ranked prefix (1 side)")(noop(prefix))
      val ubound =
        least(col("a.rk") - 1, col("b.rk") - 1) + 1 +
          least(col("a.n_sh") - col("a.rk"), col("b.n_sh") - col("b.rk"))
      val cand = prefix.as("a")
        .join(prefix.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
            col("a.n_sh") * minJaccardPpm <= col("b.n_sh") * 1000000L &&
            col("b.n_sh") * minJaccardPpm <= col("a.n_sh") * 1000000L &&
            ubound * (1000000L + minJaccardPpm) >=
              (col("a.n_sh") + col("b.n_sh")) * minJaccardPpm)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      timeIt("cand join + distinct (from cold)")(noop(cand))
      val verify = cand
        .join(base.as("fa"), col("doc_a") === col("fa.doc_id"))
        .join(base.as("fb"), col("doc_b") === col("fb.doc_id"))
        .withColumn("inter", size(array_intersect(col("fa.sh"), col("fb.sh"))))
        .withColumn("_uni",
          size(col("fa.sh")) + size(col("fb.sh")) - col("inter"))
        .filter(col("inter") * 1000000L >= lit(minJaccardPpm) * col("_uni"))
      timeIt("full pipeline (cand+verify)")(noop(verify))
      // and the real operator end to end for reference
      timeIt("prefixJaccardPairs e2e") {
        noop(Dedup.prefixJaccardPairs(docs, col("doc_id"), col("text"),
          n = 3, minJaccardPpm = minJaccardPpm))
      }
      base.unpersist()
      Dedup.unpersistIntermediates()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
