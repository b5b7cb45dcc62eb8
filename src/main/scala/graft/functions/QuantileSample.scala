package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic bottom-k-by-hash sample for quantile estimation, as a
  * typed `Aggregator` — the scale path next to exact `percentile`
  * (`a1_percentiles`), whose per-group state buffers EVERY distinct value
  * and is unbounded at 100 TB.
  *
  * State is the `k` rows with the smallest `(hash, id)` keys (hash =
  * [[KmvSketch.hash]] of a UNIQUE row id — uniqueness is the caller's
  * contract and what makes the order total, so ties at the k boundary
  * cannot make the sample ambiguous). That set is
  *
  *  - **bounded**: k (hash, id, value) triples per group, ever;
  *  - **merge-order independent**: the bottom-k of a union is the
  *    bottom-k of bottom-k's — the same reason [[KmvSketch]] works —
  *    so map-side partials, shuffles, and AQE re-plans cannot change it;
  *  - **a uniform row sample**: the hash is uniform on row ids, so the
  *    kept rows are a simple random sample of the group, and the sample
  *    quantile estimates the true quantile with error ~ O(1/√k);
  *  - **oracle-replayable**: DuckDB recomputes the identical sample
  *    (`ROW_NUMBER() OVER (ORDER BY hash, id) <= k`) and the identical
  *    interpolation ([[QuantileSample.quantileCont]] spells out the
  *    formula both engines evaluate in the same IEEE order — the builtin
  *    `quantile_cont` is NOT used, so engine-specific interpolation
  *    algebra cannot diverge).
  *
  * Below k rows the sample is the whole group and the estimate is exact.
  */
class QuantileSample(k: Int)
    extends Aggregator[(Long, Long, Double), Array[(Long, Long, Double)], Array[Double]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Array[(Long, Long, Double)] = Array.empty

  private def lt(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
    h1 < h2 || (h1 == h2 && i1 < i2)

  // buffer invariant: sorted ascending by (hash, id), length <= k
  def reduce(
      buf: Array[(Long, Long, Double)],
      row: (Long, Long, Double)): Array[(Long, Long, Double)] = {
    val (h, id, _) = row
    if (buf.length >= k && !lt(h, id, buf(k - 1)._1, buf(k - 1)._2)) buf
    else {
      // binary search for the insertion point in (hash, id) order
      var lo = 0
      var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(buf(mid)._1, buf(mid)._2, h, id)) lo = mid + 1 else hi = mid
      }
      val outLen = math.min(buf.length + 1, k)
      val out = new Array[(Long, Long, Double)](outLen)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = row
      System.arraycopy(buf, lo, out, lo + 1, outLen - lo - 1)
      out
    }
  }

  def merge(
      a: Array[(Long, Long, Double)],
      b: Array[(Long, Long, Double)]): Array[(Long, Long, Double)] = {
    val out = new Array[(Long, Long, Double)](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      out(n) =
        if (j >= b.length ||
          (i < a.length && lt(a(i)._1, a(i)._2, b(j)._1, b(j)._2))) {
          val x = a(i); i += 1; x
        } else { val x = b(j); j += 1; x }
      n += 1
    }
    out
  }

  /** The sampled values, sorted ascending — ready for interpolation. */
  def finish(r: Array[(Long, Long, Double)]): Array[Double] = {
    val vs = new Array[Double](r.length)
    var i = 0
    while (i < r.length) { vs(i) = r(i)._3; i += 1 }
    java.util.Arrays.sort(vs)
    vs
  }

  def bufferEncoder: Encoder[Array[(Long, Long, Double)]] =
    ExpressionEncoder[Array[(Long, Long, Double)]]()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object QuantileSample {
  /** Linear-interpolated quantile over an ASCENDING-sorted sample array —
    * the `quantile_cont` definition, spelled out so the DuckDB oracle can
    * evaluate the byte-identical expression: `pos = q·(n-1)` (0-based),
    * `v = s[⌊pos⌋] + (pos-⌊pos⌋)·(s[min(⌊pos⌋+1, n-1)] - s[⌊pos⌋])`.
    * Empty samples yield NULL via the explicit guard (without it,
    * `⌊q·(0-1)⌋ = -1` would drive `element_at` to index 0, which Spark
    * rejects at runtime).
    */
  def quantileCont(sample: Column, q: Double): Column = {
    val n = size(sample)
    val pos = lit(q) * (n - 1).cast("double")
    val lo = floor(pos).cast("int")
    val frac = pos - lo.cast("double")
    val vlo = element_at(sample, lo + 1) // element_at is 1-based
    val vhi = element_at(sample, least(lo + lit(2), n))
    when(n === 0, lit(null).cast("double"))
      .otherwise(vlo + frac * (vhi - vlo))
  }
}
