package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a DataFrame program plus (when the semantics
  * are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against (see SparkEntry).
  *
  * Oracle-parity discipline applied to every oracled query (SURVEY.md §7.5):
  *   - deterministic total ORDER BY (a unique key suffix on every sort);
  *   - computed doubles are either decimal-exact (`sum(cast(x as
  *     decimal(12,2)))` then cast to double) or rounded, so both engines
  *     produce bit-identical doubles;
  *   - never emit a raw `events.ts` (nanosecond parquet timestamps truncate
  *     to microseconds in Spark but not DuckDB) — always truncate/derive;
  *   - explicit NULLS FIRST/LAST wherever nulls can appear in sort keys.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Oracled query. */
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  /** Non-SQL-expressible query (driver records a weaker rows-only check). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
