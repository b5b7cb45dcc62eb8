package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Shared contract of the product-quantization expressions: `codebook(s)(j)`
  * is code `j` of subspace `s` (all subspaces same code count, all codes
  * same sub-dimension), an input vector must have exactly
  * `numSubspaces × subDim` dimensions, and every subspace distance is the
  * EXACT INTEGER squared L2 on the 2²⁰ grid: vector and codebook
  * components each enter through the single grid op
  * `floor(x·2²⁰ + 0.5)` (the [[UnitMicros]] grid-entry convention — the
  * power-of-two multiply is an exact exponent shift, so the only rounded
  * float op is the final `+0.5`, one exactly-rounded IEEE op immune to
  * FMA contraction) and `Σ (mv − mc)²` is pure long arithmetic —
  * order-independent, so any engine replays the encode argmin and the
  * ADC estimate bit-for-bit with NO float-summation boundary class (the
  * earlier double-L2 formulation replayed the IEEE sequence, which holds
  * per op but leaves an engine free to contract/reorder the chain — the
  * s26 lesson).
  *
  * Corrupt-input contract (mirrors [[UnitMicros]]): a NULL vector
  * element, a NaN, or a ±Infinity component → NULL (a NaN would
  * otherwise quantize to 0 via `(long) Math.floor(NaN)` and be SILENTLY
  * encoded into the persisted store — the one thing a reproducible
  * encoder must never do). Finite components past [[PqExpression.MaxAbsGrid]]
  * grid units (raw |x| > 64 — absurd for unit-scale embeddings)
  * throw loudly instead of overflowing the long distance accumulation:
  * `|m| ≤ 2²⁶` keeps each `(mv−mc)²` term ≤ 2⁵⁴ and any `subDim ≤ 256`
  * sum inside Long range, checked once at entry so the hot distance
  * loops stay guard-free.
  */
private[functions] trait PqExpression extends UnaryExpression {
  def codebook: Array[Array[Array[Double]]]

  require(codebook.nonEmpty && codebook.forall(_.length == codebook(0).length)
    && codebook(0).nonEmpty && codebook.flatten.forall(_.length == codebook(0)(0).length),
    "codebook must be rectangular: numSubspaces x numCodes x subDim, all non-empty")
  require(codebook.flatten.flatten.forall(x =>
    !x.isNaN && !x.isInfinite && Math.abs(x) * 1048576.0 <= PqExpression.MaxAbsGrid),
    "codebook components must be finite and within the 2^20 grid headroom")

  protected val numSubspaces: Int = codebook.length
  protected val numCodes: Int = codebook(0).length
  protected val subDim: Int = codebook(0)(0).length
  protected val expectDim: Int = numSubspaces * subDim

  /** The codebook on the 2²⁰ grid, quantized ONCE at construction — the
    * same single grid op the per-row vector entry uses, so the oracle's
    * `floor(c·1048576 + 0.5)` over the raw codebook values lands on
    * identical longs.
    */
  protected lazy val cbMicros: Array[Array[Array[Long]]] =
    codebook.map(_.map(_.map(x => Math.floor(x * 1048576.0 + 0.5).toLong)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  /** null on a null/NaN/Infinity element, else the 2²⁰-grid long[]
    * (loud on a dim mismatch or an out-of-headroom finite component —
    * silently encoding a prefix or an overflowed distance would corrupt
    * the index).
    */
  protected def checkedMicros(input: Any): Array[Long] = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != expectDim)
      throw new IllegalArgumentException(
        s"$prettyName: vector dim ${arr.numElements()} != codebook dim $expectDim")
    var i = 0
    while (i < expectDim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val v = arr.toDoubleArray()
    val m = new Array[Long](expectDim)
    i = 0
    while (i < expectDim) {
      if (java.lang.Double.isNaN(v(i)) || java.lang.Double.isInfinite(v(i)))
        return null
      m(i) = Math.floor(v(i) * 1048576.0 + 0.5).toLong
      if (Math.abs(m(i)) > PqExpression.MaxAbsGrid)
        throw new IllegalArgumentException(
          s"$prettyName: component ${v(i)} exceeds the 2^20 grid headroom")
      i += 1
    }
    m
  }

  /** Codegen prologue shared by both expressions: dim check, null/NaN
    * scan, grid projection of the input vector into `mv` with the
    * loud headroom check.
    */
  protected def microsPrologue(
      ctx: CodegenContext, c: String, bad: String, mv: String): String = {
    val v = ctx.freshName("pqRaw")
    val i = ctx.freshName("pqPi")
    s"""
       |if ($c.numElements() != $expectDim) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: vector dim " + $c.numElements() + " != codebook dim $expectDim");
       |}
       |boolean $bad = false;
       |for (int $i = 0; $i < $expectDim; $i++) {
       |  if ($c.isNullAt($i)) { $bad = true; break; }
       |}
       |long[] $mv = null;
       |if (!$bad) {
       |  double[] $v = $c.toDoubleArray();
       |  $mv = new long[$expectDim];
       |  for (int $i = 0; !$bad && $i < $expectDim; $i++) {
       |    if (Double.isNaN($v[$i]) || Double.isInfinite($v[$i])) {
       |      $bad = true;
       |    } else {
       |      $mv[$i] = (long) Math.floor($v[$i] * 1048576.0D + 0.5D);
       |      if (Math.abs($mv[$i]) > ${PqExpression.MaxAbsGrid}L) {
       |        throw new IllegalArgumentException(
       |          "$prettyName: component " + $v[$i] + " exceeds the 2^20 grid headroom");
       |      }
       |    }
       |  }
       |}
     """.stripMargin
  }
}

object PqExpression {
  /** Loud headroom bound on a grid component: `|m| ≤ 2²⁶` keeps every
    * `(mv − mc)²` term ≤ 2⁵⁴, so even a subDim-256 fold stays ≤ 2⁶² —
    * no silent long overflow in the distance loops. Unit-scale
    * embeddings sit at ~2²⁰ (raw |x| ≤ 64), six bits inside.
    */
  val MaxAbsGrid: Long = 1L << 26
}

/** PQ encoder: the input vector's per-subspace nearest-code indices (by
  * exact integer squared L2 on the 2²⁰ grid, first index on ties) as
  * `array<int>` of length `numSubspaces`. One fused codegen'd loop per
  * row — the declarative formulation would be `numSubspaces × numCodes`
  * interpreted `aggregate(zip_with(...))` folds (SURVEY §8.5/§8.23).
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
    val mv = checkedMicros(input)
    if (mv == null) return null
    val out = new Array[Int](numSubspaces)
    var s = 0
    while (s < numSubspaces) {
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < numCodes) {
        val c = cbMicros(s)(j)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val t = mv(s * subDim + i) - c(i)
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
      val cbRef = ctx.addReferenceObj("pqCodebookMicros", cbMicros, "long[][][]")
      val mv = ctx.freshName("pqVec")
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
         |${microsPrologue(ctx, c, bad, mv)}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$numSubspaces];
         |  for (int $s = 0; $s < $numSubspaces; $s++) {
         |    int $best = 0;
         |    long $bestD = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $numCodes; $j++) {
         |      long[] $cw = $cbRef[$s][$j];
         |      long $d = 0L;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        long $t = $mv[$s * $subDim + $i] - $cw[$i];
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
  * `array<long>` of length `numSubspaces × numCodes` where entry
  * `s·numCodes + j` is the EXACT integer micros-grid squared L2 between
  * the query's subspace-`s` slice and code `j` — one fused pass, shared
  * layout with `PqEncode`-coded base rows so the ADC estimate
  * `Σ_s lut[s·numCodes + code_s]` is a pure long sum: the candidate-pool
  * ORDER BY it decides is integer, never a float boundary.
  */
case class PqLut(child: Expression, codebook: Array[Array[Array[Double]]])
    extends PqExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override protected def nullSafeEval(input: Any): Any = {
    val mv = checkedMicros(input)
    if (mv == null) return null
    val out = new Array[Long](numSubspaces * numCodes)
    var s = 0
    while (s < numSubspaces) {
      var j = 0
      while (j < numCodes) {
        val c = cbMicros(s)(j)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val t = mv(s * subDim + i) - c(i)
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
      val cbRef = ctx.addReferenceObj("pqCodebookMicros", cbMicros, "long[][][]")
      val mv = ctx.freshName("plVec")
      val out = ctx.freshName("plOut")
      val s = ctx.freshName("plS")
      val j = ctx.freshName("plJ")
      val i = ctx.freshName("plI")
      val d = ctx.freshName("plD")
      val t = ctx.freshName("plT")
      val bad = ctx.freshName("plBad")
      val cw = ctx.freshName("plCw")
      s"""
         |${microsPrologue(ctx, c, bad, mv)}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[${numSubspaces * numCodes}];
         |  for (int $s = 0; $s < $numSubspaces; $s++) {
         |    for (int $j = 0; $j < $numCodes; $j++) {
         |      long[] $cw = $cbRef[$s][$j];
         |      long $d = 0L;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        long $t = $mv[$s * $subDim + $i] - $cw[$i];
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
