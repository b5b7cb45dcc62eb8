package graft.functions

import graft.TestSpark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** [[VectorDot]] / [[CosineSim]] must be drop-in replacements for the
  * higher-order-function folds they displace: every value bit-for-bit
  * equal (the similarity oracles replay the declarative formula), and the
  * same NULL/edge behavior — mismatched lengths or a null element → NULL,
  * empty arrays → 0 (dot) / NaN (cosine).
  */
class VectorDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dotNative(x: Column, y: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  private def cosNative(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))

  private def dotHof(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)

  private def cosHof(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    val (ad, bd) = (d(a), d(b))
    dotHof(ad, bd) / (sqrt(dotHof(ad, ad)) * sqrt(dotHof(bd, bd)))
  }

  // deterministic float vectors, including negatives and magnitudes that
  // exercise non-associative summation order
  private def randVecs(n: Int, dim: Int): Seq[Array[Float]] = {
    val r = new scala.util.Random(7)
    Seq.fill(n)(Array.fill(dim)((r.nextDouble() * 20 - 10).toFloat))
  }

  test("double dot is bit-for-bit the zip_with+aggregate fold") {
    val rows = randVecs(40, 17).grouped(2).map(p => (p(0), p(1))).toSeq
    val df = rows.toDF("a", "b")
      .select(dotNative(col("a").cast("array<double>"), col("b").cast("array<double>")).as("n"),
        dotHof(transform(col("a"), _.cast("double")),
          transform(col("b"), _.cast("double"))).as("h"))
    val got = df.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("cosine is bit-for-bit the three-fold declarative formula") {
    val rows = randVecs(40, 33).grouped(2).map(p => (p(0), p(1))).toSeq
    val got = rows.toDF("a", "b")
      .select(cosNative(col("a"), col("b")).as("n"), cosHof(col("a"), col("b")).as("h"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("long dot matches the fold; int8-scale values never overflow") {
    val r = new scala.util.Random(11)
    val rows = Seq.fill(20)((Array.fill(64)(r.nextInt(255) - 127L),
      Array.fill(64)(r.nextInt(255) - 127L)))
    val got = rows.toDF("a", "b")
      .select(dotNative(col("a"), col("b")).as("n"),
        aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L), _ + _).as("h"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("mismatched lengths and null elements → NULL; empty → 0 / NaN") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)), // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null element
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double])) // empty
      .toDF("a", "b")
      .select(dotNative(col("a"), col("b")).as("d"), cosNative(col("a"), col("b")).as("c"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) == 0.0 && rows(2).getDouble(1).isNaN)
  }

  test("NULL array input → NULL output") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(dotNative(col("a"), col("b")).as("d"), cosNative(col("a"), col("b")).as("c"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("interpreted eval agrees with codegen (null-heavy filter breaks codegen path)") {
    // a non-deterministic-free projection under both evaluation modes:
    // force the interpreted path by evaluating the expression directly
    val a = Array(1.5, -2.25, 3.0)
    val b = Array(0.5, 4.0, -1.0)
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(dotNative(col("a"), col("b")), cosNative(col("a"), col("b")))
      .collect()(0)
    val expectedDot = a.zip(b).map { case (x, y) => x * y }.sum
    assert(viaDf.getDouble(0) == expectedDot)
    val interp = VectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      .eval(null)
    assert(interp == expectedDot)
  }
}
