package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — points joined to every interval
  * `[start, end)` that contains them, with or without an equi-key. The
  * telemetry/attribution staple ("every click inside a campaign window",
  * "readings during an incident").
  *
  * Spark plans a keyless `p >= start AND p < end` join as
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons, a
  * scale-killer when both sides are large. The scalable shape is bucket
  * decomposition: quantize time into fixed-width buckets, explode each
  * interval to the buckets it covers, map each point to its single
  * bucket, equi-join on bucket id (+ optional keys), then apply the exact
  * range predicate as a residual. Work becomes
  * O(|points| + Σ interval_len/width) shuffled rows — linear, skew
  * distributed along the time axis — and the join is a plain shuffled
  * hash/sort-merge equi-join that AQE can size. Each matched pair appears
  * exactly once because a point lives in exactly one bucket.
  *
  * `bucketWidth` tunes the explosion factor: an interval explodes to
  * `len/width + 1` rows, so pick width ≈ the typical interval length
  * (explosion ≈ 2×). All arithmetic is exact integer on the caller's
  * long-typed axis (epoch micros, positions, …); floored division keeps
  * negative coordinates correct.
  *
  * Extension operator — the reference has no inequality joins beyond the
  * nested-loop theta path (reference: nested_join.py:1000-1036), which is
  * exactly the quadratic shape this operator exists to avoid.
  */
object IntervalJoin {

  /** Bucket id of coordinate `x` = the bucket's start coordinate
    * `x - (x floormod w)` — pure long arithmetic (Spark's `/` on longs
    * goes through double and `floor` would round above 2^53; `pmod`
    * keeps negative coordinates floored, not truncated toward zero).
    * Exact everywhere except the pathological bottom edge: coordinates
    * in `[Long.MinValue, Long.MinValue + x floormod w)` underflow the
    * subtraction — irrelevant for any physical axis (epoch micros,
    * offsets), noted for the generic contract.
    */
  private[graft] def bucketOf(x: Column, w: Long): Column =
    x - pmod(x, lit(w))

  /** @param points      side holding the point coordinate; column names
    *                    must be disjoint from `intervals`'
    * @param intervals   side holding `[start, end)` half-open bounds
    * @param point       long-typed point column name in `points`
    * @param start       long-typed inclusive lower bound in `intervals`
    * @param end         long-typed exclusive upper bound in `intervals`
    * @param bucketWidth bucket size on the same axis/unit; > 0
    * @param keys        optional equi-key column names present on BOTH
    *                    sides (joined in addition to the bucket id)
    * @return inner join: all `points` columns + all `intervals` columns
    *         for every pair with `start <= point < end` (and equal keys)
    */
  def bucketed(
      points: DataFrame,
      intervals: DataFrame,
      point: String,
      start: String,
      end: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // Empty intervals (end <= start) match nothing; dropping them first
    // also protects sequence() from emitting a DESCENDING bucket range.
    val iv = intervals.filter(col(end) > col(start))
      .withColumn("_gb", explode(sequence(
        bucketOf(col(start), bucketWidth),
        bucketOf(col(end) - 1, bucketWidth), // last covered bucket: end-1
        lit(bucketWidth))))
    val pt = points.withColumn("_gb", bucketOf(col(point), bucketWidth))
    pt.join(iv, Seq("_gb") ++ keys)
      .filter(col(point) >= col(start) && col(point) < col(end))
      .drop("_gb")
  }

  /** Interval × interval OVERLAP join under the same bucket scheme: every
    * left/right pair of half-open intervals with
    * `lStart < rEnd AND rStart < lEnd`. Both sides explode to their
    * covered buckets; a pair sharing several buckets would surface once
    * per shared bucket, so the residual keeps it only in the bucket of
    * `greatest(lStart, rStart)` — the first bucket where both intervals
    * are present — making each overlapping pair appear EXACTLY once with
    * no downstream distinct.
    *
    * Same scale shape as [[bucketed]]: linear shuffled rows, plain
    * equi-join, explosion bounded by interval length / bucketWidth.
    *
    * @param left      intervals with `[lStart, lEnd)` long columns
    * @param right     intervals with `[rStart, rEnd)` long columns
    *                  (column names must be disjoint from `left`'s)
    * @return inner join of all overlapping pairs (all left + right cols)
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def explodeSide(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s))
        .withColumn("_gb", explode(sequence(
          bucketOf(col(s), bucketWidth),
          bucketOf(col(e) - 1, bucketWidth),
          lit(bucketWidth))))
    explodeSide(left, lStart, lEnd)
      .join(explodeSide(right, rStart, rEnd), Seq("_gb") ++ keys)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("_gb") === bucketOf(greatest(col(lStart), col(rStart)), bucketWidth))
      .drop("_gb")
  }
}
