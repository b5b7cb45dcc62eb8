package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Shared contract of the product-quantization expressions: `codebook(s)(j)`
  * is code `j` of subspace `s` (all subspaces same code count, all codes
  * same sub-dimension), an input vector must have exactly
  * `numSubspaces × subDim` dimensions, and every subspace distance is the
  * squared L2 accumulated left-to-right in double — the IEEE sequence the
  * DuckDB oracle replays with `list_reduce` (its first-element seed equals
  * the 0.0 seed because squared terms are never -0.0-signed).
  *
  * A NULL vector element poisons the arithmetic, so both expressions
  * return NULL for it — same convention as [[VectorDot]].
  */
private[functions] trait PqExpression extends UnaryExpression {
  def codebook: Array[Array[Array[Double]]]

  require(codebook.nonEmpty && codebook.forall(_.length == codebook(0).length)
    && codebook(0).nonEmpty && codebook.flatten.forall(_.length == codebook(0)(0).length),
    "codebook must be rectangular: numSubspaces x numCodes x subDim, all non-empty")

  protected val numSubspaces: Int = codebook.length
  protected val numCodes: Int = codebook(0).length
  protected val subDim: Int = codebook(0)(0).length
  protected val expectDim: Int = numSubspaces * subDim

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  /** null on a null element, else the double[] (loud on a dim mismatch —
    * silently encoding a prefix would corrupt the index).
    */
  protected def checkedVector(input: Any): Array[Double] = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != expectDim)
      throw new IllegalArgumentException(
        s"$prettyName: vector dim ${arr.numElements()} != codebook dim $expectDim")
    var i = 0
    while (i < expectDim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    arr.toDoubleArray()
  }
}

/** PQ encoder: the input vector's per-subspace nearest-code indices (by
  * squared L2, first index on ties) as `array<int>` of length
  * `numSubspaces`. One fused codegen'd loop per row — the declarative
  * formulation would be `numSubspaces × numCodes` interpreted
  * `aggregate(zip_with(...))` folds (SURVEY §8.5/§8.23).
  *
  * This is the stored index of [[graft.operators.Similarity.pqTopK]]: at
  * 100 TB each vector persists as `numSubspaces` bytes (m=8, k=16 → 8
  * nibbles) instead of 256 float bytes — the 32× compression that makes
  * exhaustive candidate ranking scan-bound rather than memory-bound.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends PqExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = checkedVector(input)
    if (v == null) return null
    val out = new Array[Int](numSubspaces)
    var s = 0
    while (s < numSubspaces) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < numCodes) {
        val c = codebook(s)(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val t = v(s * subDim + i) - c(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = j } // strict <: first code wins ties
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
      val v = ctx.freshName("pqVec")
      val out = ctx.freshName("pqOut")
      val s = ctx.freshName("pqS")
      val j = ctx.freshName("pqJ")
      val i = ctx.freshName("pqI")
      val d = ctx.freshName("pqD")
      val t = ctx.freshName("pqT")
      val best = ctx.freshName("pqBest")
      val bestD = ctx.freshName("pqBestD")
      val bad = ctx.freshName("pqBad")
      val cw = ctx.freshName("pqCw")
      s"""
         |if ($c.numElements() != $expectDim) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_encode: vector dim " + $c.numElements() + " != codebook dim $expectDim");
         |}
         |boolean $bad = false;
         |for (int $i = 0; $i < $expectDim; $i++) {
         |  if ($c.isNullAt($i)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = $c.toDoubleArray();
         |  int[] $out = new int[$numSubspaces];
         |  for (int $s = 0; $s < $numSubspaces; $s++) {
         |    int $best = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $j = 0; $j < $numCodes; $j++) {
         |      double[] $cw = $cbRef[$s][$j];
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        double $t = $v[$s * $subDim + $i] - $cw[$i];
         |        $d += $t * $t;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $j; }
         |    }
         |    $out[$s] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** PQ asymmetric-distance lookup table of a QUERY vector: flattened
  * `array<double>` of length `numSubspaces × numCodes` where entry
  * `s·numCodes + j` is the squared L2 between the query's subspace-`s`
  * slice and code `j` — one fused pass, shared layout with
  * `PqEncode`-coded base rows so the ADC estimate is
  * `Σ_s lut[s·numCodes + code_s]`.
  */
case class PqLut(child: Expression, codebook: Array[Array[Array[Double]]])
    extends PqExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(input: Any): Any = {
    val v = checkedVector(input)
    if (v == null) return null
    val out = new Array[Double](numSubspaces * numCodes)
    var s = 0
    while (s < numSubspaces) {
      var j = 0
      while (j < numCodes) {
        val c = codebook(s)(j)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val t = v(s * subDim + i) - c(i)
          d += t * t
          i += 1
        }
        out(s * numCodes + j) = d
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
      val v = ctx.freshName("plVec")
      val out = ctx.freshName("plOut")
      val s = ctx.freshName("plS")
      val j = ctx.freshName("plJ")
      val i = ctx.freshName("plI")
      val d = ctx.freshName("plD")
      val t = ctx.freshName("plT")
      val bad = ctx.freshName("plBad")
      val cw = ctx.freshName("plCw")
      s"""
         |if ($c.numElements() != $expectDim) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_lut: vector dim " + $c.numElements() + " != codebook dim $expectDim");
         |}
         |boolean $bad = false;
         |for (int $i = 0; $i < $expectDim; $i++) {
         |  if ($c.isNullAt($i)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = $c.toDoubleArray();
         |  double[] $out = new double[${numSubspaces * numCodes}];
         |  for (int $s = 0; $s < $numSubspaces; $s++) {
         |    for (int $j = 0; $j < $numCodes; $j++) {
         |      double[] $cw = $cbRef[$s][$j];
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        double $t = $v[$s * $subDim + $i] - $cw[$i];
         |        $d += $t * $t;
         |      }
         |      $out[$s * $numCodes + $j] = $d;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}
