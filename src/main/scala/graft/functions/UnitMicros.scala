package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.TypeBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact unit-grid projection of a float/double-vector column — the
  * integer grid on which every ASSIGNMENT-DECIDING cosine comparison in
  * [[graft.operators.Similarity]] runs (flat/hierarchical IVF argmax,
  * super-list ranking, the s26 fidelity eval). The scale is the POWER
  * OF TWO `S = 2²⁰` ([[UnitMicros.GridScale]] = 1048576 ≈ 10⁶, same
  * granularity as the earlier micros grid):
  *
  *  1. `m_i = floor(x_i · 2²⁰ + 0.5)` — integer grid units per
  *     component (half-up via floor: `round()` half-up/half-even
  *     conventions differ across engines, `floor` never does). Because
  *     `2²⁰` is a power of two, `x_i · 2²⁰` is a pure EXPONENT SHIFT —
  *     EXACT, never rounded — so the only rounded floating op in the
  *     whole pipeline is the single final `+ 0.5` addition, which is
  *     one exactly-rounded IEEE op on an exact input. FMA contraction
  *     is therefore provably irrelevant: `fma(x, 2²⁰, 0.5)` rounds the
  *     same exact real as the two-op sequence, so fused and unfused
  *     evaluation agree bit-for-bit on every input (under the previous
  *     `·10⁶` scale the multiply itself rounded, leaving contraction a
  *     legal way for two engines to disagree);
  *  2. `nsq = Σ m_i²` — EXACT long arithmetic (order-independent);
  *  3. `s = isqrt(nsq)` — the EXACT floor integer square root
  *     ([[UnitMicros.isqrt]]: a double-`sqrt` SEED corrected by pure
  *     integer comparisons, so the result is a function of the integer
  *     `nsq` alone — an engine whose `sqrt` differs by an ulp lands on
  *     the same `s`);
  *  4. `u_i = sign(m_i) · ((|m_i| · 2²⁰) div s)` — the quantized unit
  *     vector by INTEGER division (sign-split so truncating and
  *     flooring division agree), so `dot(u_a, u_b)` (a [[VectorDot]]
  *     long fold, also exact) is a `2⁴⁰`-scaled cosine whose
  *     COMPARISONS are pure integer: no engine-dependent floating
  *     summation — or float op-ordering freedom at all — ever decides
  *     an argmax.
  *
  * Why this is bit-reproducible across engines where `round(cosine, 6)`
  * was not: a float cosine is a multi-term SUM whose accumulation order
  * differs between engines (Spark's fused loop vs DuckDB's
  * `list_cosine_similarity`), so values land within an ulp of a
  * round-6 boundary on different sides — measured: 121 of 512k
  * row×centroid cosines at sf0.1 sat within 5e-4 micro-units of a
  * boundary, and ONE flip changes an aggregate eval's hash. An earlier
  * formulation kept one float chain in step 4
  * (`floor(m_i/√nsq·10⁶+0.5)` — three rounded ops whose
  * contraction/evaluation order an engine may legally vary, e.g. FMA)
  * and the driver's DuckDB build disagreed with Spark on a handful of
  * argmaxes two rounds running; step 1's move from `10⁶` to `2²⁰`
  * removes the last MULTI-op float chain anywhere in the pipeline —
  * every later step is integer arithmetic, and the `sqrt` inside
  * `isqrt` is correction-shielded — so there is no boundary class left
  * and no op-ordering freedom to exploit.
  *
  * Quantization error: `|u| ≈ 2²⁰` with ≤ 1 unit truncation error per
  * component, so the scaled cosine `dot/2⁴⁰` sits within ~√dim·2⁻²⁰
  * of the true cosine — indistinguishable for ranking quality (recall
  * gates unchanged), but the ARGMAX is now a deterministic function of
  * the stored bytes.
  *
  * Edge semantics: mismatched ranking still handles NULLs as the
  * rounded-cosine formulation did — a NULL element or NULL array → NULL
  * (sorts last under `desc`), and a NaN/±Infinity component also → NULL
  * (`(long) Math.floor(NaN)` is 0: silently filing a corrupt vector as
  * if the component were zero is the one thing a bit-reproducibility
  * expression must never do — under the replaced rounded cosine the NaN
  * at least propagated into the ordering); an all-zero (or empty)
  * vector projects to all zeros, dotting to 0 with everything (ties
  * then break on id). Component magnitudes past ~2²⁶ micros would
  * overflow the `Σ m_i²` long and raise (ANSI-style loud), unreachable
  * for unit-scale embedding data. The DuckDB replays assume finite
  * vectors (a NaN raises on the BIGINT cast there — loud, not
  * divergent-silent).
  */
case class UnitMicros(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unit_micros"

  override def inputTypes = Seq(TypeBridge.doubleArray)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<double> input, got ${t.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    val u = UnitMicros.project(a.toDoubleArray())
    if (u == null) null else UnsafeArrayData.fromPrimitiveArray(u)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("umI")
      val n = ctx.freshName("umN")
      val bad = ctx.freshName("umBad")
      val xs = ctx.freshName("umXs")
      val m = ctx.freshName("umM")
      val u = ctx.freshName("umU")
      val nsq = ctx.freshName("umNsq")
      val isq = ctx.freshName("umIsq")
      val q = ctx.freshName("umQ")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = false;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  $bad = $a.isNullAt($i);
         |}
         |double[] $xs = $bad ? null : $a.toDoubleArray();
         |if (!$bad) {
         |  for (int $i = 0; !$bad && $i < $n; $i++) {
         |    $bad = Double.isNaN($xs[$i]) || Double.isInfinite($xs[$i]);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $m = new long[$n];
         |  long $nsq = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $m[$i] = (long) Math.floor($xs[$i] * 1048576.0D + 0.5D);
         |    $nsq = Math.addExact($nsq, Math.multiplyExact($m[$i], $m[$i]));
         |  }
         |  long[] $u = new long[$n];
         |  if ($nsq != 0L) {
         |    long $isq = graft.functions.UnitMicros.isqrt($nsq);
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $q = Math.multiplyExact(Math.abs($m[$i]), 1048576L) / $isq;
         |      $u[$i] = $m[$i] < 0L ? -$q : $q;
         |    }
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($u);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitMicros =
    copy(child = newChild)
}

object UnitMicros {
  /** The grid scale `2²⁰`: a POWER OF TWO so the entry multiply
    * `x · GridScale` is an exact exponent shift (zero float rounding —
    * see the class scaladoc). ~10⁶, the granularity the micros grid had.
    */
  val GridScale: Long = 1L << 20

  /** `GridScale²` = `2⁴⁰` — the scale of a [[graft.functions.VectorDot]]
    * fold of two unit-grid vectors (`dot / UnitScale2 ≈ cosine`).
    */
  val UnitScale2: Long = 1L << 40

  /** The expression's exact scalar form on a plain double array — ALSO
    * the formula per-partition kernels replicate
    * ([[graft.operators.Dedup.embeddingNearDupPairs]]'s pair tiles), kept
    * here so a Scala-side replication can never drift from the Catalyst
    * path (the interpreted eval calls this directly; the codegen inlines
    * the identical steps, spec-pinned against it). Returns null for a
    * NaN/Infinity component — the expression's NULL contract.
    */
  def project(xs: Array[Double]): Array[Long] = {
    val n = xs.length
    val m = new Array[Long](n)
    var nsq = 0L
    var i = 0
    while (i < n) {
      if (java.lang.Double.isNaN(xs(i)) || java.lang.Double.isInfinite(xs(i)))
        return null
      m(i) = Math.floor(xs(i) * 1048576.0 + 0.5).toLong
      nsq = Math.addExact(nsq, Math.multiplyExact(m(i), m(i)))
      i += 1
    }
    val u = new Array[Long](n)
    if (nsq != 0L) {
      val isq = isqrt(nsq)
      i = 0
      while (i < n) {
        val q = Math.multiplyExact(Math.abs(m(i)), 1048576L) / isq
        u(i) = if (m(i) < 0L) -q else q
        i += 1
      }
    }
    u
  }

  /** Exact floor integer square root. The double `sqrt` is only a SEED:
    * the two correction loops compare in pure long arithmetic
    * (`x² ≤ n ⟺ x ≤ n div x` for positive `x` — division-form, so no
    * `x²` overflow), so the result is a function of `n` alone, immune
    * to any engine/platform `sqrt` ulp. Loops run ≤ 1 step when the
    * seed is correctly rounded (always, for `n < 2⁵³`); they fully
    * correct any seed regardless. The SQL replay
    * (PipelineQueries.sqlUnitCte) mirrors the seed + integer-correction
    * shape with CASE steps.
    */
  def isqrt(n: Long): Long = {
    if (n <= 0L) return 0L
    var x = Math.floor(Math.sqrt(n.toDouble)).toLong
    if (x < 1L) x = 1L
    while (x > n / x) x -= 1L
    while (x + 1L <= n / (x + 1L)) x += 1L
    x
  }
}
