package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage-truncating checkpoint with explicit, per-family release.
  *
  * Iterative operators (`Dedup.clusterPairs`, `Graph.pageRank`) must cut
  * their logical plans per iteration — a plain persist keeps the full
  * upstream plan embedded in every loop level, and the driver-side
  * canonicalization + cache-lookup cost grows with the iteration count
  * even when the data is tiny. `Dataset.localCheckpoint` does the
  * truncation but parks its blocks in an executor-cached RDD that
  * `Dataset.unpersist` cannot reach (only GC frees it); this wrapper
  * records the backing RDD so `release()` can drop the blocks
  * deterministically — Bench/Verify call it between queries via the
  * operators' `unpersistIntermediates`.
  *
  * Registrations are TAGGED with the owning operator family and
  * `release(family)` drops only that family's blocks: unlike a persist,
  * a truncated plan CANNOT recompute once its blocks are gone (the
  * upstream lineage no longer exists), so one family's
  * `unpersistIntermediates` must never evict a checkpoint backing
  * another family's still-unconsumed lazy result. The corollary for
  * callers: consume (collect/write) a checkpoint-backed result BEFORE
  * releasing its own family.
  */
private[graft] object LocalCheckpoints {

  private val rdds = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, org.apache.spark.rdd.RDD[_])]

  /** Eagerly localCheckpoint `df` and register the backing RDD under
    * `family` (the operator object that will release it).
    */
  def apply(family: String)(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed.foreach {
      case l: LogicalRDD => rdds.add((family, l.rdd))
      case _ => ()
    }
    cp
  }

  /** Unpersist the checkpoint blocks backing `df` and deregister them —
    * for iterative loops that retire the PREVIOUS iteration's checkpoint
    * as soon as the next one is materialized, instead of accumulating one
    * copy per iteration until the family-wide release.
    */
  def drop(df: DataFrame, blocking: Boolean = false): Unit = {
    val backing: Set[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collect {
        case l: LogicalRDD => l.rdd
      }.toSet
    val it = rdds.iterator()
    while (it.hasNext) if (backing.contains(it.next()._2)) it.remove()
    backing.foreach(_.unpersist(blocking))
  }

  /** Unpersist every checkpoint registered under `family` since the last
    * call for that family; other families' blocks stay live.
    */
  def release(family: String, blocking: Boolean = false): Int = {
    var n = 0
    val it = rdds.iterator()
    while (it.hasNext) {
      val (f, rdd) = it.next()
      if (f == family) { it.remove(); rdd.unpersist(blocking); n += 1 }
    }
    n
  }
}
