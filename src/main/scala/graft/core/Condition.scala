package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate algebra for `filterBy`, mirroring the reference's `Condition`
  * class (reference: cassandra_joinlib/commands.py:52-159): comparison atoms
  * with ops `> < >= <= = IN CONTAINS` plus `NOT AND OR` combinators exposed
  * as `! & |` operator sugar.
  *
  * Unlike the reference (row-at-a-time Python eval), a Condition here
  * compiles to a Catalyst `Column` expression, so Catalyst handles pushdown,
  * codegen and null-rejection (SQL three-valued logic — the reference's
  * comparisons are null-rejecting too, commands.py:125-139).
  */
sealed trait Condition {
  def &(other: Condition): Condition = Condition.And(this, other)
  def |(other: Condition): Condition = Condition.Or(this, other)
  def unary_! : Condition = Condition.Not(this)

  /** Compile to a Catalyst Column. `resolve` maps a (table, column) pair to
    * the qualified Column in the current plan.
    */
  def toColumn(resolve: (String, String) => Column): Column = this match {
    case Condition.Cmp(lhs, op, rhs) =>
      val l = Condition.operandToColumn(lhs, resolve)
      op match {
        case "="  => l === Condition.operandToColumn(rhs, resolve)
        case "!=" => l =!= Condition.operandToColumn(rhs, resolve)
        case ">"  => l > Condition.operandToColumn(rhs, resolve)
        case "<"  => l < Condition.operandToColumn(rhs, resolve)
        case ">=" => l >= Condition.operandToColumn(rhs, resolve)
        case "<=" => l <= Condition.operandToColumn(rhs, resolve)
        case "IN" =>
          rhs match {
            case Condition.Lit(vs: Seq[_]) => l.isin(vs: _*)
            case other => throw new IllegalArgumentException(
              s"IN requires a literal sequence right-hand side, got $other")
          }
        case "CONTAINS" =>
          // collection membership: lhs array column contains rhs value
          // (reference: commands.py:73-74, eval `raw_rhs in raw_lhs`)
          array_contains(l, Condition.operandToColumn(rhs, resolve))
        case other =>
          throw new IllegalArgumentException(s"Unsupported operator: $other")
      }
    case Condition.And(a, b) => a.toColumn(resolve) && b.toColumn(resolve)
    case Condition.Or(a, b)  => a.toColumn(resolve) || b.toColumn(resolve)
    case Condition.Not(c)    => !c.toColumn(resolve)
  }

  /** All column references in this condition tree. */
  def references: Seq[(String, String)] = this match {
    case Condition.Cmp(l, _, r) =>
      Seq(l, r).collect { case Condition.ColRef(t, c) => (t, c) }
    case Condition.And(a, b) => a.references ++ b.references
    case Condition.Or(a, b)  => a.references ++ b.references
    case Condition.Not(c)    => c.references
  }
}

object Condition {
  val cmpOps: Set[String] = Set("=", "!=", ">", "<", ">=", "<=", "IN", "CONTAINS")

  sealed trait Operand
  /** Reference to `table.column` (table may be an alias). */
  final case class ColRef(table: String, column: String) extends Operand
  /** A literal value. */
  final case class Lit(value: Any) extends Operand

  final case class Cmp(lhs: Operand, op: String, rhs: Operand) extends Condition {
    require(cmpOps.contains(op), s"unknown comparison operator '$op'")
  }
  final case class And(left: Condition, right: Condition) extends Condition
  final case class Or(left: Condition, right: Condition) extends Condition
  final case class Not(child: Condition) extends Condition

  /** Reference-style constructor: operands given as strings where
    * `"table.column"` means a column reference and anything else is a
    * literal (reference resolves this per-row, commands.py:109-123; we
    * resolve it structurally).
    */
  def apply(lhs: Any, op: String, rhs: Any): Condition =
    Cmp(operand(lhs), op, operand(rhs))

  def operand(x: Any): Operand = x match {
    case s: String if s.count(_ == '.') == 1 && !s.exists(_.isWhitespace) =>
      val Array(t, c) = s.split('.')
      ColRef(t, c)
    case o: Operand => o
    case v          => Lit(v)
  }

  def col(table: String, column: String): Operand = ColRef(table, column)
  def lit(v: Any): Operand = Lit(v)

  private[core] def operandToColumn(
      o: Operand, resolve: (String, String) => Column): Column = o match {
    case ColRef(t, c) => resolve(t, c)
    case Lit(v: Seq[_]) =>
      array(v.map(x => org.apache.spark.sql.functions.lit(x)): _*)
    case Lit(v) => org.apache.spark.sql.functions.lit(v)
  }
}
