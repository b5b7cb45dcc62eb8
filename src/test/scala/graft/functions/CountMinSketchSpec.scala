package graft.functions

import graft.TestSpark

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def estimates(df: DataFrame, probes: Seq[Long]): Map[Long, Long] = {
    val cms = udaf(new CountMinSketch(depth, width), Encoders.scalaLong)
    val sk = df.agg(cms(col("h")).as("sk"))
    probes.toDF("p").crossJoin(sk)
      .select(col("p"),
        CountMinSketch.estimate(col("sk"), col("p"), depth, width).as("est"))
      .as[(Long, Long)].collect().toMap
  }

  test("estimates are one-sided: never below the true count, exact for unseen keys' floor") {
    // 100 distinct keys with known multiplicities key % 7 + 1
    val rows = (0L until 100L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = estimates(rows.toDF("h"), (0L until 100L))
    est.foreach { case (k, e) =>
      assert(e >= exact(k), s"key $k estimated $e below true ${exact(k)}")
      // depth-4 / width-64 on 400 rows: generous collision allowance
      assert(e <= exact(k) + 400 / width * 4, s"key $k over-counted: $e vs ${exact(k)}")
    }
  }

  test("sketch is partition-count invariant (cells are sums)") {
    val rows = (0L until 5000L).map(k => k % 37)
    val cms = udaf(new CountMinSketch(depth, width), Encoders.scalaLong)
    def sk(parts: Int): Seq[Long] =
      rows.toDF("h").repartition(parts).agg(cms(col("h"))).as[Seq[Long]].head()
    assert(sk(1) == sk(13))
  }

  test("streaming: the sketch maintains incrementally across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val cms = udaf(new CountMinSketch(depth, width), Encoders.scalaLong)
    val stream = MemoryStream[(String, Long)]
    val q = stream.toDF().toDF("g", "h")
      .groupBy("g").agg(cms(col("h")).as("sk"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      stream.addData((0 until 50).map(i => ("a", (i % 9).toLong)): _*)
      q.processAllAvailable()
      stream.addData((50 until 100).map(i => ("a", (i % 9).toLong)): _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").select("sk").as[Seq[Long]].head()
      val batch = (0 until 100).map(i => (i % 9).toLong).toDF("h")
        .agg(cms(col("h"))).as[Seq[Long]].head()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("cell arithmetic matches the column form") {
    (0 until depth).foreach { i =>
      Seq(0L, 1L, 999999999L, 123456789L).foreach { h =>
        val viaCol = Seq(h).toDF("h")
          .select(CountMinSketch.bucketCol(col("h"), i, width)).as[Long].head()
        assert(viaCol == CountMinSketch.bucket(h, i, width).toLong)
      }
    }
  }
}
