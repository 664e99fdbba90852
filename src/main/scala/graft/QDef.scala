package graft

/** One declared engine operator: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle SQL the driver
  * uses for the hash-match correctness gate. `sql = None` → the driver
  * records a weaker rows-only check (used for approx/sketch operators).
  */
final case class QDef(name: String, fn: Q, sql: Option[String])

object QDef {
  def apply(name: String, sql: String)(fn: Q): QDef = QDef(name, fn, Some(sql))
  def noOracle(name: String)(fn: Q): QDef = QDef(name, fn, None)
}
