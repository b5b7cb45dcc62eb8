package graft.operators

import org.apache.spark.sql.DataFrame
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
    * @param payload   right columns to attach (null when no right row ≤ ts)
    * @param tieBreak  right column ordering same-ts right rows (last wins)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      leftId: String,
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    // The payload rides as ONE struct so the attached values always come
    // from a single right row — independent per-column last(...) would mix
    // fields across right rows whenever a payload value is null.
    val pType = StructType(payload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val l = left.select(
      (keys :+ ts :+ leftId).map(col) :+
        lit(null).cast(pType).as("_p") :+
        lit(1).as("_side") :+ col(leftId).as("_tb"): _*)
    val r = right.select(
      (keys :+ ts).map(col) ++ Seq(lit(null).cast(left.schema(leftId).dataType).as(leftId)) :+
        struct(payload.map(col): _*).as("_p") :+
        lit(0).as("_side") :+ col(tieBreak).as("_tb"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_pp", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        (keys :+ ts :+ leftId).map(col) ++
          payload.map(c => col(s"_pp.$c").as(c)): _*)
  }
}
