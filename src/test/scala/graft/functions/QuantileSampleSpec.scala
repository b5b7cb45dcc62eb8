package graft.functions

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantileSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(df: DataFrame, k: Int): DataFrame = {
    val qs = udaf(new QuantileSample(k), ExpressionEncoder[(Long, Long, Double)]())
    df.select(col("g"), KmvSketch.hash(col("id")).as("h"), col("id"), col("v"))
      .groupBy("g")
      .agg(qs(col("h"), col("id"), col("v")).as("sample"))
      .select(col("g"),
        QuantileSample.quantileCont(col("sample"), 0.5).as("p50"),
        QuantileSample.quantileCont(col("sample"), 0.9).as("p90"),
        size(col("sample")).as("sn"))
  }

  private def rows(n: Int): DataFrame =
    spark.range(n).select(
      (col("id") % 2).as("g"), col("id"),
      (col("id") % 1000).cast("double").as("v"))

  test("below k the sample is the whole group and the estimate is exact") {
    val df = Seq((0L, 1L, 10.0), (0L, 2L, 20.0), (0L, 3L, 30.0), (0L, 4L, 40.0))
      .toDF("g", "id", "v")
    val r = sketch(df, 16).collect()(0)
    assert(r.getAs[Int]("sn") == 4)
    assert(r.getAs[Double]("p50") == 25.0) // pos 1.5 between 20 and 30
    assert(r.getAs[Double]("p90") == 37.0) // pos 2.7 between 30 and 40
  }

  test("result is merge-order independent: identical across partitionings") {
    val base = rows(20000)
    val a = sketch(base.repartition(1), 64).collect().map(_.toSeq).toSet
    val b = sketch(base.repartition(16), 64).collect().map(_.toSeq).toSet
    val c = sketch(base.repartition(7, col("v")), 64).collect().map(_.toSeq).toSet
    assert(a == b && b == c)
  }

  test("sample quantile tracks the exact quantile within sampling error") {
    val df = rows(50000)
    val est = sketch(df, 256).collect()
      .map(r => r.getAs[Long]("g") -> ((r.getAs[Double]("p50"), r.getAs[Double]("p90")))).toMap
    val exact = df.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("e50"), expr("percentile(v, 0.9)").as("e90"))
      .collect().map(r => r.getAs[Long]("g") -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // v spans [0, 1000); rank error ~ O(1/sqrt(256)) ≈ 6% → value error
    // bound ~ 100 on this uniform distribution, with wide margin
    exact.foreach { case (g, (e50, e90)) =>
      assert(math.abs(est(g)._1 - e50) < 100.0, s"p50 group $g: ${est(g)._1} vs $e50")
      assert(math.abs(est(g)._2 - e90) < 100.0, s"p90 group $g: ${est(g)._2} vs $e90")
    }
  }

  test("empty input yields an empty sample and NULL quantiles (not a runtime error)") {
    val qs = udaf(new QuantileSample(8), ExpressionEncoder[(Long, Long, Double)]())
    val r = Seq.empty[(Long, Long, Double)].toDF("h", "id", "v")
      .agg(qs(col("h"), col("id"), col("v")).as("sample"))
      .select(size(col("sample")).as("sn"),
        QuantileSample.quantileCont(col("sample"), 0.5).as("p50"))
      .collect()(0)
    assert(r.getAs[Int]("sn") == 0 && r.isNullAt(1))
  }

  test("streaming: the sample maintains incrementally across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val qs = udaf(new QuantileSample(16), ExpressionEncoder[(Long, Long, Double)]())
    def prepped(df: DataFrame) =
      df.select(col("g"), KmvSketch.hash(col("id")).as("h"), col("id"), col("v"))
        .groupBy("g").agg(qs(col("h"), col("id"), col("v")).as("sample"))
    val stream = MemoryStream[(String, Long, Double)]
    val q = prepped(stream.toDF().toDF("g", "id", "v"))
      .writeStream.format("memory").queryName("qs_stream")
      .outputMode("complete").start()
    try {
      stream.addData((0 until 40).map(i => ("a", i.toLong, i * 2.0)): _*)
      q.processAllAvailable()
      stream.addData((40 until 80).map(i => ("a", i.toLong, i * 2.0)): _*)
      q.processAllAvailable()
      val streamed = spark.table("qs_stream").select("sample").as[Seq[Double]].head()
      val batch = prepped(
        (0 until 80).map(i => ("a", i.toLong, i * 2.0)).toDF("g", "id", "v"))
        .select("sample").as[Seq[Double]].head()
      assert(streamed == batch)
    } finally q.stop()
  }
}
