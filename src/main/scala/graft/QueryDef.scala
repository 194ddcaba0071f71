package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through [[SparkEntry]]: a Spark query over the
  * testdata tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Contract (driver): column names of the Spark result and of the oracle SQL
  * must be identical — the correctness gate sorts columns by name and hashes
  * values. Float-producing aggregates must be made deterministic on both sides
  * (decimal-cast sums, single-rounding divisions) so hashes match bit-for-bit.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  /** Query with a DuckDB oracle. */
  def sql(oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, Some(oracle.trim))
  /** Non-SQL-expressible query (ML / LSH / graph): driver does rows-only check. */
  def rowsOnly(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
