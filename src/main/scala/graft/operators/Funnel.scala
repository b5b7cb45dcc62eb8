package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event log with greedy-earliest
  * ("first touch") semantics: step i's timestamp is the minimum event
  * time of that step STRICTLY after the user's step-(i-1) timestamp
  * (optionally within `maxGapSeconds` of it). Users who stall at step i
  * carry nulls from step i on, so per-step conversion is
  * `count(ts_step)`.
  *
  * Greedy-earliest is the CONTRACT, not an approximation of one. Without
  * a gap budget it coincides with "does any ordered chain exist"
  * (an earlier step-i pick never shrinks step i+1's unbounded search
  * space). WITH a gap budget the two differ: each hop's window starts at
  * the greedily-chosen previous step, so a user whose only within-gap
  * chains skip an early qualifying event (signup, click@+10s,
  * click@+500s, purchase@+600s under a 550 s gap) counts as stalled —
  * the first-touch rule attribution products apply. The DuckDB oracle
  * and the streaming variant implement the identical rule.
  *
  * Scale shape: one aggregation per step, each a shuffle keyed on the
  * user id — state per user is a single row of timestamps (no
  * collect_list of the user's history, which a window/array formulation
  * would materialize and which is unbounded for bot-like users). All
  * joins are equi-joins on the user key; AQE broadcasts the (shrinking)
  * funnel side when it fits. Gap arithmetic is in exact integer
  * microseconds — `unix_micros` here, `epoch_us` in the DuckDB oracle —
  * never float seconds (double rounding at cast differs between engines).
  */
object Funnel {

  /** @param events the event log
    * @param user   user/grouping key
    * @param ts     event-time timestamp column
    * @param step   step-name column matched against `steps`
    * @param steps  ordered distinct step names; output has one
    *               `ts_<step>` column per step
    * @param maxGapSeconds optional per-hop deadline: step i must occur
    *               within this many seconds of step i-1
    */
  def funnel(
      events: DataFrame,
      user: Column,
      ts: Column,
      step: Column,
      steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, s"steps must be distinct, got $steps")
    require(steps.forall(!_.contains("`")), "step names must not contain backticks")
    // output columns are named after user-supplied steps, which may carry
    // dots ("page.view") — quote every reference so col() never parses a
    // step name as a struct-field access
    def q(name: String): Column = col(s"`$name`")
    val base = events.select(user.as("user_id"), ts.as("_ts"), step.as("_step"))
    var acc = base.filter(col("_step") === steps.head)
      .groupBy("user_id").agg(min(col("_ts")).as(s"ts_${steps.head}"))
    var prev = s"ts_${steps.head}"
    for (stp <- steps.tail) {
      val nxt = base.filter(col("_step") === stp)
        .select(col("user_id").as("_u"), col("_ts"))
      val inGap = maxGapSeconds
        .map(g => unix_micros(col("_ts")) - unix_micros(q(prev)) <= g * 1000000L)
        .getOrElse(lit(true))
      val carried = acc.columns // user_id + the ts columns settled so far
      // a user who stalled earlier has a null `prev`; `_ts > null` is null,
      // the join finds nothing, and the left join carries the null forward
      acc = acc.join(nxt,
          col("user_id") === col("_u") && col("_ts") > q(prev) && inGap, "left")
        .groupBy(carried.toIndexedSeq.map(q): _*)
        .agg(min(col("_ts")).as(s"ts_$stp"))
      prev = s"ts_$stp"
    }
    acc
  }
}
