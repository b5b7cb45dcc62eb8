package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch as a typed `Aggregator`:
  * the state is the `k` smallest *distinct* hash values seen, so it is
  * bounded (`k` longs per group, vs `collect_set`'s unbounded state),
  * mergeable (map-side partial aggregation and cross-batch unions both go
  * through [[merge]]), and fully deterministic — the k-smallest set is
  * order-independent, so the driver's DuckDB oracle recomputes the sketch
  * and the estimate bit-for-bit (unlike HyperLogLog, whose register
  * layout is implementation-defined).
  *
  * Estimator: with hashes uniform on [0, 2^32), the k-th smallest value
  * h_k estimates distinct ≈ (k-1) · 2^32 / h_k (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002); relative
  * error ~ 1/√k. Below k distinct hashes the sketch IS the exact distinct
  * set and the estimate is exact.
  *
  * Input rows are pre-hashed with [[KmvSketch.hash]] so the sketch sees
  * uniform values; the hash matches the corpus-sampling family (reduce
  * mod 2^31 before one odd multiply, take mod 2^32 — exact in 64-bit
  * integer arithmetic in any engine).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  def zero: Array[Long] = Array.empty

  // buffer invariant: sorted ascending, distinct, length <= k
  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val ins = -i - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // displaces the current maximum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 } // drop cross-side dups
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Null-skipping adapter over [[KmvSketch]] for columns that may carry
  * NULLs (the profiling use: nulls are counted separately and must not
  * occupy a sketch slot). Input is boxed (`Encoders.LONG`) precisely so
  * NULL survives to [[reduce]], where it is dropped.
  */
class KmvSketchNullable(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  private val inner = new KmvSketch(k)
  def zero: Array[Long] = inner.zero
  def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
    if (h == null) buf else inner.reduce(buf, h.longValue())
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  def finish(r: Array[Long]): Array[Long] = inner.finish(r)
  def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
  def outputEncoder: Encoder[Array[Long]] = inner.outputEncoder
}

object KmvSketch {
  /** Odd multiplier (Knuth's 2654435761), coprime to the 2^32 modulus. */
  val Mult = 2654435761L
  val Inc = 104729L
  /** Hash range: [0, 2^32). */
  val HashMod = 4294967296L

  /** Uniform-ish 32-bit hash of an integer key — the shared
    * [[KeyedHash.idHash]] convention reduced mod 2^32, all floored
    * (`pmod`) so negative keys land in [0, 2^32) too. On non-negative
    * keys this is plain integer `%` arithmetic, which the oracle replays
    * exactly.
    */
  def hash(key: Column): Column =
    pmod(KeyedHash.idHash(key, Mult, Inc), lit(HashMod))

  /** Distinct-count estimate from a KMV sketch array: exact below `k`
    * entries, else `(k-1)·2^32 div h_k`. The division must be *integer*
    * division (the oracle uses `//`); `(a - a mod b) / b` is exact here
    * because both operands are exact-in-double integers. `h_k = 0` cannot
    * occur at k ≥ 2: sketch values are distinct and non-negative, so the
    * k-th smallest is ≥ k-1 ≥ 1.
    */
  def estimate(sketch: Column, k: Int): Column = {
    require(k >= 2,
      s"estimate needs k >= 2 (with k = 1 the (k-1)-scaled estimator is degenerately 0), got $k")
    val a = lit((k - 1L) * HashMod)
    val hk = element_at(sketch, k)
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(((a - pmod(a, hk)) / hk).cast("long"))
  }

  /** Largest retained hash — the sketch's "threshold" (max of all hashes
    * when fewer than `k` distinct values were seen).
    */
  def kthValue(sketch: Column): Column =
    element_at(sketch, size(sketch))
}
