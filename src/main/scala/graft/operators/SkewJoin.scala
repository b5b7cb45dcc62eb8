package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed or low-cardinality join
  * keys — the manual scale knob beside the automatic ones (AQE's
  * OptimizeSkewedJoin splits oversized sort-merge partitions at runtime,
  * [[SkewAgg]] two-stages skewed aggregation).
  *
  * Where it matters: a large ⋈ large join whose key distribution
  * concentrates most rows on a few values. The shuffle hash-partitions by
  * key, so a dominant key lands its entire row set in ONE task regardless
  * of cluster size; AQE can split that partition for sort-merge joins,
  * but salting is the declarative guarantee that also covers shuffled
  * hash joins and removes the dependence on runtime statistics.
  *
  * Mechanics: left rows scatter deterministically over `saltFactor`
  * sub-keys (hash of a caller-supplied salt source, normally the row id —
  * NOT nondeterministic randomness, so retried tasks and re-runs place
  * rows identically); the right side replicates `saltFactor`× via an
  * explode; the join key becomes (key, salt). Row-level join semantics
  * are untouched — every left row still meets every matching right row
  * exactly once — so the result is bit-identical to the plain join and
  * the oracle IS the plain join. Cost: `saltFactor`× replication of the
  * right side, the price of spreading the hot key over `saltFactor`
  * tasks; pick the smallest factor that fits the hot key in a task.
  *
  * When the right side is broadcast-small, broadcast instead — salting
  * only buys anything when both sides must shuffle.
  */
object SkewJoin {

  def salted(
      left: DataFrame,
      leftKey: Column,
      saltSource: Column,
      right: DataFrame,
      rightKey: Column,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1, s"saltFactor must be > 1, got $saltFactor")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left (right-side replication breaks " +
        s"right/full semantics), got $joinType")
    val l = left.withColumn("_lsalt", pmod(hash(saltSource), lit(saltFactor)))
    val r = right.withColumn("_rsalt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, leftKey === rightKey && col("_lsalt") === col("_rsalt"), joinType)
      .drop("_lsalt", "_rsalt")
  }
}
