package graft.sources

/** The direct-join planning decision, as a pure function — the testable
  * mirror of what the Spark Cassandra Connector's `DirectJoinStrategy`
  * decides at plan time, gated the way the reference gates its hand-rolled
  * DSE direct join.
  *
  * Reference semantics (cassandra_joinlib/hash_join.py:811-818): the right
  * side may be point-read (instead of full-scanned) iff the right table's
  * PRIMARY KEY columns are covered by the join columns —
  * `len(pks) == 1 && pks[0] == join_col` for a single key, or
  * `set(pks) ⊆ set(join_cols)` for a composite — AND direct join was not
  * explicitly disabled AND token metadata is available. Without full PK
  * coverage a per-partition point read cannot enumerate the matching rows,
  * so the gate is a *correctness* precondition, not a heuristic.
  *
  * Connector semantics layered on top (`directJoinSetting` /
  * `directJoinSizeRatio`, see [[CassandraConfig.directJoin]]): "on" forces
  * the rewrite whenever it is legal, "off" never rewrites, and "auto"
  * rewrites when the key side is estimated smaller than
  * `sizeRatio ×` the Cassandra table — point-reading beats scanning exactly
  * when the driving key set is small relative to the target table. At
  * 100 TB this decision is the difference between touching kilobytes and
  * scanning the cluster.
  */
object DirectJoin {

  /** Correctness gate: every partition-key column of the target table must
    * be a join column (hash_join.py:811-818's subset check, both arities).
    */
  def eligible(rightPkColumns: Seq[String], rightJoinColumns: Seq[String]): Boolean =
    rightPkColumns.nonEmpty && rightPkColumns.toSet.subsetOf(rightJoinColumns.toSet)

  /** Full decision. `keySideBytes` is the optimizer's size estimate of the
    * driving (already-materialized) side; `targetTableBytes` the estimate
    * of the Cassandra table. Mirrors `hash_join.py:818`'s
    * `and not self.disable_direct_join` (setting="off") and the connector's
    * auto ratio check; "on" still refuses an ineligible join — forcing the
    * rewrite past the PK gate would return wrong (partial) rows.
    */
  def decide(
      setting: String,
      rightPkColumns: Seq[String],
      rightJoinColumns: Seq[String],
      keySideBytes: Long,
      targetTableBytes: Long,
      sizeRatio: Double = 0.9): Boolean = {
    require(Set("on", "off", "auto")(setting), s"setting must be on|off|auto, got '$setting'")
    val legal = eligible(rightPkColumns, rightJoinColumns)
    setting match {
      case "off"  => false
      case "on"   => legal
      case "auto" => legal && keySideBytes.toDouble < sizeRatio * targetTableBytes.toDouble
    }
  }
}
