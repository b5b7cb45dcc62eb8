package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row top-`keep` centroid selection by exact unit-grid dot against a
  * CONFIG-SIZED centroid model carried as reference objects — the fused
  * replacement for the `crossJoin(broadcast(centroids))` ×
  * `row_number` window (partitioned by row id) shape of the IVF
  * assignment ([[graft.operators.Similarity.ivfAssignTo]] /
  * `ivfAssignHierarchical`).
  *
  * Why (guide §2.4 "remove shuffles outright"): the window formulation
  * explodes every input row × |centroids| (256× by default) and shuffles
  * that blown-up candidate set BY ROW ID just to pick each row's argmax —
  * at 100 TB that is a corpus×256 exchange whose only purpose is a
  * per-row reduction the map side could do alone. This expression
  * computes the identical selection inside the scan's projection: zero
  * exchange, zero row explosion, one tight codegen'd loop per row.
  *
  * SEMANTICS ARE BIT-FOR-BIT THE WINDOW FORMULATION'S (spec-pinned in
  * `SimilaritySpec`): candidates rank by (unit-grid dot DESC, centroid id
  * ASC) — the exact integer [[VectorDot]]-long fold over [[UnitMicros]]
  * vectors, `Math.addExact`/`multiplyExact` overflow behavior included —
  * and a candidate whose dot is NULL under the old plan (NULL/corrupt
  * input vector, or a dimension mismatch) ranks after every non-NULL dot,
  * ties on ascending id (`desc` ordering puts nulls LAST in Spark). The
  * returned array holds the top `min(keep, |candidates|)` ids in rank
  * order.
  *
  * Children (both non-nullable by call-site construction):
  *  - `vec`: the row's unit-grid vector; callers pass
  *    `coalesce(unitMicros(v), array())` so a NULL/corrupt vector arrives
  *    as the EMPTY array — dimension mismatch with the model, which is
  *    exactly the all-dots-NULL case of the window plan;
  *  - `cand`: candidate centroid ids (`array<long>`), the EMPTY array
  *    meaning "all model centroids" — the flat assignment; the
  *    hierarchical assignment passes the probed supers' member lists
  *    ([[ExpandIds]]). Ids absent from the model rank as NULL-dot
  *    (unreachable by construction).
  *
  * Model (reference objects, not children — config-sized by the
  * `maxCentroids` contract, ≤ 8192 enforced at the call site):
  * `ids` sorted ascending, `units` the flattened unit-grid matrix
  * (`dim = units.length / ids.length`).
  */
case class TopDotIds(
    vec: Expression,
    cand: Expression,
    keep: Int,
    ids: Array[Long],
    units: Array[Long])
  extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cand
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_top_dot_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cand.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) if keep > 0 &&
          ids.nonEmpty && units.length % ids.length == 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<long> inputs, keep > 0 and a " +
          s"non-empty flattened model (got keep=$keep, ${ids.length} ids, " +
          s"${units.length} unit components)")
    }

  override protected def nullSafeEval(v: Any, c: Any): Any =
    TopDotIds.topk(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      ids, units, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("tdIds", ids, "long[]")
    val unitsRef = ctx.addReferenceObj("tdUnits", units, "long[]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      s"""
         |${ev.value} = graft.functions.TopDotIds.topk(
         |  $v, $c, $idsRef, $unitsRef, $keep);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopDotIds =
    copy(vec = newLeft, cand = newRight)
}

object TopDotIds {

  /** The selection kernel — shared by interpreted eval and codegen (one
    * static call site, so the two paths can never drift). See the
    * expression scaladoc for the exact ordering contract.
    */
  def topk(vec: ArrayData, cand: ArrayData, ids: Array[Long],
      units: Array[Long], keep: Int): ArrayData = {
    val dim = units.length / ids.length
    val nCand = if (cand.numElements() == 0) ids.length else cand.numElements()
    val useAll = cand.numElements() == 0
    val vecOk = vec.numElements() == dim && dim > 0
    val xs = if (vecOk) vec.toLongArray() else null
    val k = math.min(keep, nCand)
    // insertion top-k: rank = (dotOk desc, dot desc, id asc); sizes are
    // config-bounded (keep ≤ nProbe/sProbe, candidates ≤ |centroids|)
    val selIds = new Array[Long](k)
    val selDots = new Array[Long](k)
    val selOk = new Array[Boolean](k)
    var size = 0
    var ci = 0
    while (ci < nCand) {
      val cid = if (useAll) ids(ci) else cand.getLong(ci)
      val idx = if (useAll) ci else java.util.Arrays.binarySearch(ids, cid)
      var dot = 0L
      var ok = vecOk && idx >= 0
      if (ok) {
        val base = idx * dim
        var j = 0
        while (j < dim) {
          dot = Math.addExact(dot, Math.multiplyExact(xs(j), units(base + j)))
          j += 1
        }
      }
      // find insertion position among current selection (linear — k tiny)
      var pos = size
      while (pos > 0 && {
        val bOk = selOk(pos - 1); val bDot = selDots(pos - 1); val bId = selIds(pos - 1)
        (ok && !bOk) ||
          (ok && bOk && (dot > bDot || (dot == bDot && cid < bId))) ||
          (!ok && !bOk && cid < bId)
      }) pos -= 1
      if (pos < k) {
        val last = math.min(size, k - 1)
        var m = last
        while (m > pos) {
          selIds(m) = selIds(m - 1); selDots(m) = selDots(m - 1); selOk(m) = selOk(m - 1)
          m -= 1
        }
        selIds(pos) = cid; selDots(pos) = dot; selOk(pos) = ok
        if (size < k) size += 1
      }
      ci += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (size == k) selIds else java.util.Arrays.copyOf(selIds, size))
  }
}

/** Flatten a row's probed super-list ids into the concatenation of those
  * supers' member centroid ids, from a config-sized model carried as
  * reference objects — the hierarchical assignment's candidate expansion
  * (`c2s` filing), fused into the same projection as [[TopDotIds]] so the
  * two-level argmax runs with zero exchanges. `keys` sorted ascending;
  * ids absent from `keys` contribute nothing (unreachable by
  * construction — probed supers come from the same model).
  */
case class ExpandIds(
    child: Expression,
    keys: Array[Long],
    values: Array[Array[Long]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_expand_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if keys.length == values.length =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<long> input and matching model " +
        s"(got ${t.simpleString}, ${keys.length} keys, ${values.length} lists)")
  }

  override protected def nullSafeEval(v: Any): Any =
    ExpandIds.expand(v.asInstanceOf[ArrayData], keys, values)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("eiKeys", keys, "long[]")
    val valuesRef = ctx.addReferenceObj("eiValues", values, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.ExpandIds.expand($v, $keysRef, $valuesRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ExpandIds =
    copy(child = newChild)
}

object ExpandIds {
  def expand(arr: ArrayData, keys: Array[Long],
      values: Array[Array[Long]]): ArrayData = {
    val n = arr.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      val idx = java.util.Arrays.binarySearch(keys, arr.getLong(i))
      if (idx >= 0) total += values(idx).length
      i += 1
    }
    val out = new Array[Long](total)
    var o = 0
    i = 0
    while (i < n) {
      val idx = java.util.Arrays.binarySearch(keys, arr.getLong(i))
      if (idx >= 0) {
        val vs = values(idx)
        System.arraycopy(vs, 0, out, o, vs.length)
        o += vs.length
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
