package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression computing the random-hyperplane LSH bucket
  * ids of a vector for ALL hash tables in one pass: output element `t` is
  * `Σ_h (v · planes(t*bits+h) > 0 ? 1<<h : 0)` for `h < bits`.
  *
  * This is the hot per-row loop of [[graft.operators.Similarity.lshTopK]].
  * The declarative formulation (`tables × bits` separate
  * `aggregate(zip_with(...))` folds) is excluded from whole-stage codegen
  * (higher-order functions are interpreted) and re-evaluates the vector
  * cast per fold; this expression compiles to one tight Java loop with the
  * plane weights referenced as a constant `double[][]`, and keeps the
  * surrounding projection inside a single codegen stage.
  *
  * Dot products accumulate left-to-right in double precision — bit-for-bit
  * the order the DuckDB oracle's `list_reduce` uses, so bucket ids are
  * deterministic and oracle-checkable.
  *
  * A vector containing a NULL element yields all-zero bucket ids — the
  * same result the declarative fold and the DuckDB oracle produce (the
  * null poisons every dot product, every sign test fails, every bit stays
  * 0), so the two paths cannot diverge on dirty data. Vectors longer than
  * the precomputed plane dimension are rejected loudly (a silent
  * truncation would bucket on a prefix of the vector).
  */
case class HyperplaneBuckets(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 62, s"bits must be in [1, 62], got $bits")
  require(planes.nonEmpty && planes.length % bits == 0,
    s"planes.length (${planes.length}) must be a positive multiple of bits ($bits)")

  private val numTables: Int = planes.length / bits

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // null element → null-poisoned dots → every bit 0 (oracle parity);
    // also guards toDoubleArray, which ignores the null mask on unsafe
    // rows and NPEs on generic ones
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) return new GenericArrayData(new Array[Long](numTables))
      i += 1
    }
    val v = arr.toDoubleArray()
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var h = 0
      while (h < bits) {
        val w = planes(t * bits + h)
        if (v.length > w.length)
          throw new IllegalArgumentException(
            s"vector dim ${v.length} exceeds plane dim ${w.length}")
        var dot = 0.0
        var d = 0
        while (d < v.length) { dot += v(d) * w(d); d += 1 }
        if (dot > 0.0) bucket |= (1L << h)
        h += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val v = ctx.freshName("hbVec")
      val out = ctx.freshName("hbOut")
      val t = ctx.freshName("hbT")
      val h = ctx.freshName("hbH")
      val w = ctx.freshName("hbW")
      val dot = ctx.freshName("hbDot")
      val bucket = ctx.freshName("hbBucket")
      val d = ctx.freshName("hbD")
      val hasNull = ctx.freshName("hbHasNull")
      val i = ctx.freshName("hbI")
      s"""
         |long[] $out = new long[$numTables];
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if ($c.isNullAt($i)) { $hasNull = true; break; }
         |}
         |if (!$hasNull) {
         |  double[] $v = $c.toDoubleArray();
         |  for (int $t = 0; $t < $numTables; $t++) {
         |    long $bucket = 0L;
         |    for (int $h = 0; $h < $bits; $h++) {
         |      double[] $w = $planesRef[$t * $bits + $h];
         |      if ($v.length > $w.length) {
         |        throw new IllegalArgumentException(
         |          "vector dim " + $v.length + " exceeds plane dim " + $w.length);
         |      }
         |      double $dot = 0.0;
         |      for (int $d = 0; $d < $v.length; $d++) {
         |        $dot += $v[$d] * $w[$d];
         |      }
         |      if ($dot > 0.0) $bucket |= (1L << $h);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
