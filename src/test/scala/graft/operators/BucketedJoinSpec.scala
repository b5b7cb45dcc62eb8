package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the persistent co-partitioning strategy for repeated joins
  * at scale: both tables pre-hashed into the same bucket count on the join
  * key means the join needs NO shuffle exchange at read time. This spec
  * proves the engine produces that plan (SURVEY.md §8).
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val left = (1L to 1000L).map(i => (i % 97, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i % 89, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite")
      .option("path", s"$wh/tl").bucketBy(8, "k").sortBy("k").saveAsTable("tl")
    right.write.mode("overwrite")
      .option("path", s"$wh/tr").bucketBy(8, "k").sortBy("k").saveAsTable("tr")
    try {
      val joined = spark.table("tl").join(spark.table("tr"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(800)}")
      // sanity: result is correct vs un-bucketed join
      val expect = left.join(right, "k").count()
      assert(joined.count() == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS tl")
      spark.sql("DROP TABLE IF EXISTS tr")
    }
  }
}
