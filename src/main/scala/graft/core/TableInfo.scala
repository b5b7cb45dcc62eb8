package graft.core

/** A table reference in a join pipeline.
  *
  * Mirrors the reference's `TableInfo(table_name, join_column, alias)`
  * (reference: cassandra_joinlib/commands.py:44-49). `joinColumns` is a
  * sequence to support composite (multi-column) join keys, the reference's
  * tuple keys (reference: cassandra_joinlib/utils.py:512-525).
  *
  * @param table       physical table name (parquet file stem / catalog name)
  * @param joinColumns join key column(s), in order
  * @param alias       optional alias enabling self-joins / disambiguation
  */
final case class TableInfo(
    table: String,
    joinColumns: Seq[String],
    alias: Option[String] = None) {

  /** The name this table is known by in the pipeline (alias wins). */
  def name: String = alias.getOrElse(table)

  require(joinColumns.nonEmpty, s"TableInfo($table): at least one join column required")
}

object TableInfo {
  /** Single-column convenience constructor, the common reference shape. */
  def apply(table: String, joinColumn: String): TableInfo =
    TableInfo(table, Seq(joinColumn), None)

  def apply(table: String, joinColumn: String, alias: String): TableInfo =
    TableInfo(table, Seq(joinColumn), Some(alias))
}
