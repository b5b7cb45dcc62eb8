package graft.functions

import graft.TestSpark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** [[UnitMicros]] is the integer grid every assignment-deciding cosine
  * comparison ranks on: its output must match a reference reimplementation
  * component-for-component (any engine replaying the formula gets the
  * same longs), its dot must approximate the true cosine within the
  * quantization bound, and its NULL/zero edges must mirror the
  * rounded-cosine formulation it replaced.
  */
class UnitMicrosSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unit(v: Column): Column =
    ColumnBridge.column(UnitMicros(ColumnBridge.expression(v.cast("array<double>"))))

  private def dotNative(x: Column, y: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Reference replay of the documented formula, plain Scala — integer
    * end to end past the single rounded micros op: exact `isqrt` by
    * linear search from zero (deliberately NOT the expression's seeded
    * form, so a seed/correction bug can't hide), then sign-split
    * truncating division.
    */
  private def unitRef(xs: Array[Float]): Array[Long] = {
    val m = xs.map(x => Math.floor(x.toDouble * 1048576.0 + 0.5).toLong)
    val nsq = m.map(v => v * v).sum
    if (nsq == 0L) new Array[Long](m.length)
    else {
      var s = 0L
      while ((s + 1L) * (s + 1L) <= nsq) s += 1L
      m.map(v => if (v < 0L) -((-v * 1048576L) / s) else (v * 1048576L) / s)
    }
  }

  private def randVecs(n: Int, dim: Int): Seq[Array[Float]] =
    (0 until n).map { i =>
      Array.tabulate(dim) { d =>
        val h = (i * 1299721L + d * 104729L + 17L) * 2654435761L
        ((h % 20000L) / 10000.0f) - 1.0f
      }
    }

  test("matches the reference formula component-for-component (codegen and interpreted agree)") {
    val vs = randVecs(64, 16) :+ Array.fill(16)(0.0f)
    val got = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), unit(col("v")).as("u"))
      .orderBy("id").as[(Long, Array[Long])].collect()
    vs.zipWithIndex.foreach { case (v, i) =>
      assert(got(i)._2.toSeq == unitRef(v).toSeq, s"vector $i")
    }
  }

  test("unit dot / 2^40 tracks the true cosine within the quantization bound") {
    val vs = randVecs(40, 32)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(
        (dotNative(unit(col("a.v")), unit(col("b.v"))).cast("double") /
          UnitMicros.UnitScale2.toDouble)
          .as("ucos"),
        ColumnBridge.column(CosineSim(
          ColumnBridge.expression(col("a.v").cast("array<double>")),
          ColumnBridge.expression(col("b.v").cast("array<double>")))).as("cos"))
      .collect()
    pairs.foreach { r =>
      // per-component error ≤ 0.5 micro on each side → dot error well
      // under √dim·1e-5 for unit-scale vectors; assert a loose 1e-4
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4)
    }
  }

  test("edge semantics: zero vector → zeros; null element → NULL; self-dot ≈ 2^40") {
    val out = Seq(
      (1L, Array[java.lang.Float](0.0f, 0.0f, 0.0f)),
      (2L, Array[java.lang.Float](1.0f, null, 0.0f)),
      (3L, Array[java.lang.Float](0.6f, -0.8f, 0.0f)))
      .toDF("id", "v")
      .select(col("id"), unit(col("v")).as("u"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == Seq(0L, 0L, 0L))
    assert(out(1).isNullAt(1))
    val u3 = out(2).getSeq[Long](1)
    val selfDot = u3.map(x => x * x).sum
    assert(math.abs(selfDot - UnitMicros.UnitScale2) <= 4194304L,
      s"self-dot $selfDot should be ~2^40 (unit norm on the 2^20 grid)")
  }

  test("isqrt is the exact floor square root (boundary values, both sides of every square)") {
    val cases = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L,
      999999L, 1000000L, 1000001L, (1L << 52) - 1, 1L << 52, (1L << 52) + 1,
      Long.MaxValue, Long.MaxValue - 1)
    cases.foreach { n =>
      val s = UnitMicros.isqrt(n)
      assert(s >= 0L && s <= n / math.max(s, 1L),
        s"isqrt($n)=$s: s² must be ≤ n")
      assert(n / (s + 1L) < s + 1L, s"isqrt($n)=$s: (s+1)² must be > n")
    }
    // perfect squares land exactly
    Seq(3L, 1000L, 3037000498L).foreach { r =>
      assert(UnitMicros.isqrt(r * r) == r)
      assert(UnitMicros.isqrt(r * r - 1) == r - 1)
    }
  }

  test("a NaN or infinite component → NULL, never a silently-zeroed micros entry") {
    // (long) Math.floor(NaN) is 0 — filing a corrupt vector as if the
    // component were zero would silently assign it to a real list; the
    // expression returns NULL instead (sorts last, like a NULL array).
    // Both the interpreted and codegen paths must agree.
    val rows = Seq(
      (1L, Array(Float.NaN, 1.0f)),
      (2L, Array(Float.PositiveInfinity, 1.0f)),
      (3L, Array(Float.NegativeInfinity, 1.0f)),
      (4L, Array(0.5f, 0.5f)))
    val out = rows.toDF("id", "v")
      .select(col("id"), unit(col("v")).as("u")).orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1) && out(2).isNullAt(1))
    assert(!out(3).isNullAt(1))
    val interpreted = rows.map { case (i, xs) =>
      val r = spark.range(1).select(
        unit(typedlit(xs.toSeq)).as("u")).collect().head
      i -> r.isNullAt(0)
    }.toMap
    assert(interpreted(1L) && interpreted(2L) && interpreted(3L) && !interpreted(4L))
  }
}
