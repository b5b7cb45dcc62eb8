package graft.functions

import graft.TestSpark

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 8
  private def agg = new KmvSketch(k)

  /** Ground truth: the k smallest distinct values. */
  private def ref(xs: Seq[Long]): Seq[Long] = xs.distinct.sorted.take(k)

  private def fold(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))

  private val listGen = Gen.listOf(Gen.chooseNum(0L, 60L))
  private def sample(seed: Long): List[Long] =
    listGen.pureApply(Gen.Parameters.default, Seed(seed))

  test("reduce keeps the k smallest distinct values, sorted") {
    (1 to 50).foreach { s =>
      val xs = sample(s.toLong)
      assert(fold(xs).toSeq == ref(xs), s"seed $s input $xs")
    }
  }

  test("merge of any split equals the sketch of the whole (mergeability)") {
    (1 to 50).foreach { s =>
      val a = sample(s.toLong); val b = sample(1000L + s)
      assert(agg.merge(fold(a), fold(b)).toSeq == ref(a ++ b), s"seed $s")
      // commutative
      assert(agg.merge(fold(b), fold(a)).toSeq == ref(a ++ b), s"seed $s")
    }
  }

  test("order independence: any permutation yields the identical sketch") {
    val xs = Seq(9L, 3L, 9L, 14L, 0L, 3L, 27L, 5L, 5L, 11L, 2L, 8L)
    val expected = ref(xs)
    Seq(xs.reverse, xs.sorted, scala.util.Random.shuffle(xs)).foreach { p =>
      assert(fold(p).toSeq == expected)
    }
  }

  test("below k distinct values the estimate is exact; above, within ~3/sqrt(k)") {
    val kBig = 64
    val sk = udaf(new KmvSketch(kBig), Encoders.scalaLong)
    // 2000 distinct keys, each appearing 3x — duplicates must not bias
    val n = 2000
    val df = (0 until n).flatMap(i => Seq.fill(3)(i.toLong)).toDF("key")
      .select(KmvSketch.hash(col("key")).as("h"))
    val est = df.agg(sk(col("h")).as("s"))
      .select(KmvSketch.estimate(col("s"), kBig)).as[Long].head()
    assert(math.abs(est - n).toDouble / n < 3.0 / math.sqrt(kBig.toDouble),
      s"estimate $est too far from $n")

    val small = (0 until 10).map(_.toLong).toDF("key")
      .select(KmvSketch.hash(col("key")).as("h"))
    val estSmall = small.agg(sk(col("h")).as("s"))
      .select(KmvSketch.estimate(col("s"), kBig)).as[Long].head()
    assert(estSmall == 10L)
  }

  test("streaming: the sketch maintains incrementally across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val kBig = 16
    val sk = udaf(new KmvSketch(kBig), Encoders.scalaLong)
    val stream = MemoryStream[(String, Long)]
    val q = stream.toDF().toDF("grp", "key")
      .select(col("grp"), KmvSketch.hash(col("key")).as("h"))
      .groupBy("grp").agg(sk(col("h")).as("sk"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      // two triggers with overlapping keys — the merge path must dedup
      stream.addData((0 until 40).map(i => ("a", i.toLong)): _*)
      q.processAllAvailable()
      stream.addData((20 until 60).map(i => ("a", i.toLong)): _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream").select("sk").as[Seq[Long]].head()
      val batch = (0 until 60).map(_.toLong).toDF("key")
        .select(KmvSketch.hash(col("key")).as("h"))
        .agg(sk(col("h"))).as[Seq[Long]].head()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("negative keys hash into [0, 2^32) and estimate rejects k < 2") {
    val hs = Seq(-5L, -2147483649L, 0L, 7L).toDF("key")
      .select(KmvSketch.hash(col("key"))).as[Long].collect()
    assert(hs.forall(h => h >= 0L && h < KmvSketch.HashMod), hs.mkString(","))
    intercept[IllegalArgumentException] {
      KmvSketch.estimate(col("s"), 1)
    }
  }

  test("partial aggregation across partitions matches a single-partition run") {
    val keys = (0 until 500).map(_.toLong)
    val sk = udaf(new KmvSketch(16), Encoders.scalaLong)
    def sketchOf(parts: Int): Seq[Long] =
      keys.toDF("key").repartition(parts)
        .select(KmvSketch.hash(col("key")).as("h"))
        .agg(sk(col("h"))).as[Seq[Long]].head()
    assert(sketchOf(1) == sketchOf(7))
  }
}
