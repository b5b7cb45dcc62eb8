package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage-truncating checkpoint with explicit release.
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
  */
private[graft] object LocalCheckpoints {

  private val rdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]

  /** Eagerly localCheckpoint `df` and register the backing RDD. */
  def apply(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed.foreach {
      case l: LogicalRDD => rdds.add(l.rdd)
      case _ => ()
    }
    cp
  }

  /** Unpersist every checkpoint registered since the last call. */
  def release(blocking: Boolean = false): Int = {
    var n = 0
    var rdd = rdds.poll()
    while (rdd != null) { rdd.unpersist(blocking); n += 1; rdd = rdds.poll() }
    n
  }
}
