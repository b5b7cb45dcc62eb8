package graft.core

/** Join type, mapped 1:1 to the reference's four fluent entry points
  * (reference: cassandra_joinlib/join_executor.py:95-130).
  */
sealed abstract class JoinKind(val sparkName: String)
object JoinKind {
  case object Inner     extends JoinKind("inner")
  case object LeftOuter extends JoinKind("left")
  case object RightOuter extends JoinKind("right")
  case object FullOuter extends JoinKind("full")
}

/** One queued join — the analog of the reference's `joins_info` IR dict
  * (reference: cassandra_joinlib/hash_join.py:275-289, θ operator captured
  * at nested_join.py:290-300).
  *
  * @param operator θ operator between the key columns. The hash path accepts
  *                 only "="; the nested path accepts = != < > <= >=.
  */
final case class JoinSpec(
    kind: JoinKind,
    left: TableInfo,
    right: TableInfo,
    operator: String = "=") {
  require(JoinSpec.thetaOps.contains(operator), s"unknown join operator '$operator'")
  require(
    operator == "=" || (left.joinColumns.size == 1 && right.joinColumns.size == 1),
    "theta operators require single-column join keys")
}

object JoinSpec {
  val thetaOps: Set[String] = Set("=", "!=", "<", ">", "<=", ">=")
}
