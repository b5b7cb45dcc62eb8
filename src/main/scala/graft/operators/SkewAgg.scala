package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated aggregation: a handful of heavy-hitter keys (a 4-value
  * `event_type` over billions of events, a viral `user_id`) would send all
  * rows of one key through a single reducer. Salting splits each key into
  * `salts` sub-keys for a parallel partial aggregate, then a second (tiny)
  * aggregate merges the partials — the same two-stage shape AQE's skew
  * mitigation applies to joins, made explicit for aggregations.
  *
  * The salt uses `spark_partition_id()`, so stage 1 combines within each
  * input partition's rows without any extra column entropy, and the merged
  * result is exactly the unsalted aggregate (sums in exact decimal are
  * associative).
  */
object SkewAgg {

  /** count + exact-decimal sum of `value` per `key`, two-stage salted. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column): DataFrame =
    df.withColumn("_salt", spark_partition_id())
      .groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(value.cast("decimal(18,2)")).as("_s"))
      .groupBy(col("key"))
      .agg(sum(col("_n")).as("n"),
        sum(col("_s")).cast("double").as("sum_value"))
}
