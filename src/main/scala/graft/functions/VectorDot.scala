package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.TypeBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst dot product of two array columns — the hot per-pair
  * loop of every [[graft.operators.Similarity]] tier (candidate scoring in
  * brute-force, LSH, IVF, and the quantized integer ranking).
  *
  * The declarative formulation `aggregate(zip_with(a, b, _ * _), 0, _ + _)`
  * is a higher-order function — `CodegenFallback`, evaluated interpreted
  * with a lambda-variable binding per element, and it materializes the
  * zipped product array per pair. Over an N×Q candidate join that cost
  * dominates the query. This expression compiles to one tight fused Java
  * loop (no intermediate array) inside the surrounding whole-stage-codegen
  * projection.
  *
  * Semantics are bit-for-bit those of the fold it replaces:
  *  - element type double → double accumulation, left-to-right IEEE order
  *    (the DuckDB oracle's `list_reduce` replays the identical sequence);
  *  - element type long → long with overflow raising, matching ANSI-mode
  *    `Multiply`/`Add` (unreachable for int8-quantized dots: |x| ≤ 127
  *    overflows only past 2^44 dimensions);
  *  - mismatched lengths → NULL (`zip_with` pads with null, which poisons
  *    the fold); a NULL element in either array → NULL; empty arrays → 0.
  *
  * SQL note: each argument coerces independently (int→long, float→double),
  * so MIXED element types like `(array<int>, array<double>)` land on
  * different targets and fail analysis with the type-check message below —
  * cast both sides to one element type explicitly.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = elementType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vector_dot"

  // SQL callers get analyzer coercion: int arrays widen to long, float
  // arrays to double (long tried first so integral input stays exact);
  // the expected-type vocabulary is private[sql], hence the bridge and
  // the inferred result type
  override def inputTypes =
    Seq(TypeBridge.longOrDoubleArray, TypeBridge.longOrDoubleArray)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if lt == rt && (lt == DoubleType || lt == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<double> or two array<long> inputs, " +
            s"got ${l.simpleString} and ${r.simpleString}")
    }

  private def anyNullElement(a: ArrayData, b: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements() || anyNullElement(a, b)) return null
    elementType match {
      case DoubleType =>
        val xs = a.toDoubleArray()
        val ys = b.toDoubleArray()
        var acc = 0.0
        var i = 0
        while (i < xs.length) { acc += xs(i) * ys(i); i += 1 }
        acc
      case LongType =>
        val xs = a.toLongArray()
        val ys = b.toLongArray()
        var acc = 0L
        var i = 0
        while (i < xs.length) {
          acc = Math.addExact(acc, Math.multiplyExact(xs(i), ys(i)))
          i += 1
        }
        acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("vdI")
      val n = ctx.freshName("vdN")
      val bad = ctx.freshName("vdBad")
      val xs = ctx.freshName("vdXs")
      val ys = ctx.freshName("vdYs")
      val acc = ctx.freshName("vdAcc")
      val (jt, toArr, accStep) = elementType match {
        case DoubleType =>
          ("double", "toDoubleArray", s"$acc += $xs[$i] * $ys[$i];")
        case LongType =>
          ("long", "toLongArray",
            s"$acc = Math.addExact($acc, Math.multiplyExact($xs[$i], $ys[$i]));")
      }
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  $bad = $a.isNullAt($i) || $b.isNullAt($i);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  $jt[] $xs = $a.$toArr();
         |  $jt[] $ys = $b.$toArr();
         |  $jt $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $accStep
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Native one-pass cosine similarity of two `array<double>` columns:
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`, all three accumulators
  * advanced in a single fused loop — each accumulator still adds its
  * products in index order, so the value is bit-for-bit the three-fold
  * declarative formula (and the DuckDB oracle's replay of it).
  *
  * Replaces THREE interpreted `aggregate(zip_with(...))` passes (plus
  * their zipped intermediate arrays) per candidate pair in
  * [[graft.operators.Similarity.cosine]].
  *
  * NULL/edge semantics of the formula it replaces: mismatched lengths or a
  * NULL element → NULL (the poisoned dot propagates through `/` and `*`);
  * empty or all-zero vectors → NaN (0/0), exactly as the declarative
  * division produces.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_sim"

  // SQL callers get analyzer coercion: float arrays widen to double
  override def inputTypes =
    Seq(TypeBridge.doubleArray, TypeBridge.doubleArray)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<double> inputs, " +
            s"got ${l.simpleString} and ${r.simpleString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    val xs = a.toDoubleArray()
    val ys = b.toDoubleArray()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    i = 0
    while (i < xs.length) {
      dot += xs(i) * ys(i)
      na += xs(i) * xs(i)
      nb += ys(i) * ys(i)
      i += 1
    }
    dot / (Math.sqrt(na) * Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("csI")
      val n = ctx.freshName("csN")
      val bad = ctx.freshName("csBad")
      val xs = ctx.freshName("csXs")
      val ys = ctx.freshName("csYs")
      val dot = ctx.freshName("csDot")
      val na = ctx.freshName("csNa")
      val nb = ctx.freshName("csNb")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  $bad = $a.isNullAt($i) || $b.isNullAt($i);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $xs = $a.toDoubleArray();
         |  double[] $ys = $b.toDoubleArray();
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $xs[$i] * $ys[$i];
         |    $na += $xs[$i] * $xs[$i];
         |    $nb += $ys[$i] * $ys[$i];
         |  }
         |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
