package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's DataFrame API lacks
  * natively: for every left row, attach the most recent right row whose
  * timestamp is ≤ the left timestamp, per key. The time-series/feature-
  * store staple ("the price in effect at order time", "the last view
  * before this click").
  *
  * Implementation = compose existing operators (preference (a) from the
  * build rules): tag both sides, union, and carry the latest right payload
  * forward with `last(..., ignoreNulls)` over a (key, time)-ordered
  * window. ONE shuffle on the key — the same cost as a plain windowed
  * aggregation, versus the naive inequality-join which Spark would plan as
  * a broadcast-nested-loop. Right rows sort before left rows at equal
  * timestamps, giving inclusive (≤) semantics; `tieBreak` orders
  * same-timestamp right rows deterministically.
  */
object AsOfJoin {

  /** @param left      rows to enrich; must contain `keys` + `ts` + `leftId`
    * @param right     payload source; must contain `keys` + `ts` + `payload`
    * @param keys      equi-key column names (both sides)
    * @param ts        event-time column name (both sides)
    * @param leftId    unique left row id (kept in the output)
    * @param payload   right columns to attach (null when no right row
    *                  matches)
    * @param tieBreak  right column ordering same-ts right rows (last wins:
    *                  the LARGEST tieBreak at the winning timestamp)
    * @param direction `"backward"` (default): most recent right row with
    *                  `right.ts ≤ left.ts`; `"forward"`: earliest right
    *                  row with `right.ts ≥ left.ts` — same one-shuffle
    *                  union+window shape, scanned in reverse time order
    * @param toleranceMicros max allowed |left.ts − right.ts|; a match
    *                  beyond it nulls the whole payload (the match is
    *                  discarded, NOT replaced by the next-nearest row —
    *                  pandas merge_asof semantics). Micros for timestamp
    *                  `ts` columns, the column's own units for numerics.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      leftId: String,
      payload: Seq[String],
      tieBreak: String,
      direction: String = "backward",
      toleranceMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType, TimestampType}
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    toleranceMicros.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    // The payload rides as ONE struct so the attached values always come
    // from a single right row — independent per-column last(...) would mix
    // fields across right rows whenever a payload value is null. The right
    // timestamp rides inside the same struct for the tolerance check.
    val pType = StructType(
      StructField("_rts", right.schema(ts).dataType, nullable = true) +:
        payload.map(c => StructField(c, right.schema(c).dataType, nullable = true)))
    val l = left.select(
      (keys :+ ts :+ leftId).map(col) :+
        lit(null).cast(pType).as("_p") :+
        lit(1).as("_side") :+ col(leftId).as("_tb"): _*)
    val r = right.select(
      (keys :+ ts).map(col) ++ Seq(lit(null).cast(left.schema(leftId).dataType).as(leftId)) :+
        struct(col(ts).as("_rts") +: payload.map(col): _*).as("_p") :+
        lit(0).as("_side") :+ col(tieBreak).as("_tb"): _*)
    // Backward scans time ascending; forward scans descending, so "last
    // seen right row" is the nearest FUTURE one. Either way right rows
    // sort before the left row at equal timestamps (inclusive bound), and
    // _tb ascending makes the largest tie-break the last seen.
    val tsOrd = if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrd, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_pp", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val gated = toleranceMicros match {
      case None => matched
      case Some(tol) =>
        def us(c: Column) = right.schema(ts).dataType match {
          case TimestampType => unix_micros(c)
          case _ => c.cast("long")
        }
        val diff =
          if (direction == "backward") us(col(ts)) - us(col("_pp._rts"))
          else us(col("_pp._rts")) - us(col(ts))
        matched.withColumn("_pp",
          when(col("_pp").isNotNull && diff <= tol, col("_pp")))
    }
    gated.select(
      (keys :+ ts :+ leftId).map(col) ++
        payload.map(c => col(s"_pp.$c").as(c)): _*)
  }
}
