package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a typed
  * `Aggregator` — one-pass frequency estimation over an unbounded key
  * domain in `depth × width` longs of state, the vocab-stats tier for a
  * corpus whose exact term histogram would itself be a large shuffle.
  *
  * Every cell is a SUM of per-row increments, so the sketch is
  *
  *  - **bounded**: `depth·width` longs per group regardless of key count;
  *  - **merge-order independent**: addition commutes — map-side partials,
  *    shuffle order, and streaming triggers cannot change any cell;
  *  - **deterministic and oracle-replayable**: rows are bucketed by the
  *    MinHash affine family `h_i(x) = ((2i+1)·x + 31i²+7) mod P mod width`
  *    over [[TextFunctions.polyHash]] values (all exact int64 arithmetic
  *    — DuckDB recomputes every cell and every estimate bit-for-bit,
  *    unlike murmur-based sketch libraries whose layout is
  *    implementation-defined);
  *  - **one-sided**: estimates only over-count (collisions add), by at
  *    most ~`2·total/width` with probability `1 - 2^-depth` — width is
  *    the accuracy knob, depth the confidence knob.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  def zero: Array[Long] = new Array[Long](depth * width)

  def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < depth) {
      buf(i * width + CountMinSketch.bucket(h, i, width)) += 1L
      i += 1
    }
    buf
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  /** Same prime as the MinHash permutation family. */
  val HashP = 1000000007L

  /** Row-`i` bucket of a (non-negative, < P) hashed key — exact int64
    * arithmetic, replayed by the oracle.
    */
  def bucket(h: Long, i: Int, width: Int): Int =
    ((h * (2L * i + 1) + (31L * i * i + 7)) % HashP % width).toInt

  /** Column form of [[bucket]] (identical integer arithmetic). */
  def bucketCol(h: Column, i: Int, width: Int): Column =
    (h * (2L * i + 1) + (31L * i * i + 7)) % HashP % width

  /** Point estimate for a hashed key: min over the sketch's depth rows —
    * `element_at` is 1-based, hence the +1.
    */
  def estimate(sketch: Column, h: Column, depth: Int, width: Int): Column = {
    val rows = (0 until depth).map(i =>
      element_at(sketch, (bucketCol(h, i, width) + i * width + 1).cast("int")))
    if (rows.length == 1) rows.head else least(rows: _*)
  }
}
