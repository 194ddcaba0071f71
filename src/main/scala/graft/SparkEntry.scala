package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module operator registries. Every implemented operator
  * from SURVEY §2 appears once in [[queries]]; SQL-expressible ones also appear
  * in [[oracleSql]] with IDENTICAL column names (the driver sorts columns by
  * name and hashes values).
  */
object SparkEntry {

  /** All operator registries, merged. Later modules must not reuse names. */
  private lazy val registry: Map[String, QueryDef] =
    graft.queries.Relational.defs ++
      graft.queries.TextQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.VectorQueries.defs ++
      graft.queries.MlQueries.defs ++
      graft.queries.GraphQueries.defs ++
      graft.queries.FunctionQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.AnalyticsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's workflow 1 end to end: TF-IDF features → k-means
    * blocking → candidate self-join → cosine kernel → global top-K. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_billmatch")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, qd) if qd.oracle.isDefined => k -> qd.oracle.get }

  /** Full defs (serial flag, gate expectations) for Verify. */
  def defs: Map[String, QueryDef] = registry
}
