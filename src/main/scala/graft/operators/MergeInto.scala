package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE / upsert: apply a change batch to a base snapshot keyed by
  * `keyCol`. Changes carry an `opCol` with values `I` (insert), `U` (update)
  * or `D` (delete) and, optionally, a monotone sequence column that orders
  * multiple changes to the same key within one batch (last change wins).
  *
  * This is the table-maintenance companion to the table-diff and SCD2
  * operators: diff detects drift between two snapshots, SCD2 reconstructs the
  * validity history, MERGE produces the next snapshot from the current one
  * plus a change feed — the Delta/Iceberg `MERGE INTO` semantics expressed on
  * plain DataFrames.
  *
  * Spark-first shape: NO full-outer join and no join at all — base and
  * changes are unioned with a priority column and reduced per key by ONE hash
  * aggregation (`max_by` over a (priority, seq) struct). That is a single
  * shuffle on the key, map-side combinable (each partition pre-reduces its
  * rows for a key before the exchange), and skew-safe under AQE. At 100 TB
  * the base dominates the row count; a join-based MERGE would push the whole
  * base through a join operator to match a comparatively tiny change batch,
  * whereas the union+reduce shape touches each base row exactly once and
  * never builds a hash table over it. Deletes survive the reduction as
  * tombstones and are dropped in the final projection, so a delete correctly
  * wins over the base row it shadows.
  *
  * Determinism: the reducing struct orders by (priority, seq); ties —
  * multiple changes to one key with equal seq — are resolved arbitrarily, so
  * callers that need replayable output must provide a unique seq per
  * (key, change). The gate query derives seq from the change row id.
  */
object MergeInto {

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Apply `changes` to `base`. `base` columns = payload (must include
    * `keyCol`); `changes` columns = payload + `opCol` (+ `seqCol`). Returns
    * the next snapshot with exactly the base's columns. */
  def apply(base: DataFrame, changes: DataFrame, keyCol: String,
            opCol: String = "op", seqCol: Option[String] = None): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(keyCol), s"base lacks key column $keyCol")
    require(changes.columns.contains(opCol), s"changes lack op column $opCol")

    // Base rows rank below every change; among changes, higher seq wins.
    val baseTagged = base
      .withColumn("_op", lit("B"))
      .withColumn("_prio", lit(0L))
      .withColumn("_seq", lit(Long.MinValue))
    val chgTagged = changes
      .withColumn("_op", col(opCol))
      .withColumn("_prio", lit(1L))
      .withColumn("_seq",
        seqCol.map(c => col(c).cast("long")).getOrElse(lit(0L)))
      .select(payload.map(col) :+ col("_op") :+ col("_prio") :+ col("_seq"): _*)

    val unioned = baseTagged
      .select(payload.map(col) :+ col("_op") :+ col("_prio") :+ col("_seq"): _*)
      .unionByName(chgTagged)

    val rowStruct = struct(
      (payload.filterNot(_ == keyCol).map(col) :+ col("_op")): _*)
    val reduced = unioned
      .groupBy(col(keyCol))
      .agg(max_by(rowStruct, struct(col("_prio"), col("_seq"))).as("_row"))

    reduced
      .filter(col("_row._op") =!= OpDelete)
      .select(col(keyCol) +:
        payload.filterNot(_ == keyCol).map(c => col(s"_row.$c").as(c)): _*)
  }
}
