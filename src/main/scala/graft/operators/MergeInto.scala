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
  * Two physical strategies, chosen by `broadcastChanges`:
  *
  *  - `true` (default — the overwhelmingly common shape at 100 TB, where the
  *    change batch is tiny next to the base): the base is LEFT ANTI joined
  *    against the broadcast change-key set and the surviving changes are
  *    appended. The base is NEVER shuffled and never builds a hash table —
  *    each base row streams through one broadcast probe. Zero exchanges on
  *    the base side.
  *  - `false` (change feed too large to broadcast): base and changes are
  *    unioned with a priority column and reduced per key by ONE `max_by`
  *    aggregation — a single shuffle on the key, no join at all. The
  *    whole-row buffer forces a SortAggregate (struct buffers are not
  *    hash-aggregable), which is still the right trade when both sides are
  *    huge: one exchange + per-partition sort vs shuffling both sides into
  *    a join.
  *
  * In both strategies deletes survive as tombstones until the final
  * projection, so a delete correctly shadows the base row it targets.
  *
  * Determinism: with `seqCol`, the last change per key wins (including
  * delete-then-reinsert sequences); ties on equal seq are resolved
  * arbitrarily, so callers that need replayable output must provide a unique
  * seq per (key, change). Without `seqCol`, the change batch must carry at
  * most one change per key.
  */
object MergeInto {

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Apply `changes` to `base`. `base` columns = payload (must include
    * `keyCol`); `changes` columns = payload + `opCol` (+ `seqCol`). Returns
    * the next snapshot with exactly the base's columns. */
  def apply(base: DataFrame, changes: DataFrame, keyCol: String,
            opCol: String = "op", seqCol: Option[String] = None,
            broadcastChanges: Boolean = true): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(keyCol), s"base lacks key column $keyCol")
    require(changes.columns.contains(opCol), s"changes lack op column $opCol")
    val rest = payload.filterNot(_ == keyCol)

    // Normalize the feed to payload + (_op, _seq) and reduce it to the LAST
    // change per key. The reduction runs on the change side only — small in
    // the broadcast strategy, one shared shuffle in the union strategy.
    val chgNorm = changes
      .withColumn("_op", col(opCol))
      .withColumn("_seq",
        seqCol.map(c => col(c).cast("long")).getOrElse(lit(0L)))
      .select(payload.map(col) :+ col("_op") :+ col("_seq"): _*)

    if (broadcastChanges) {
      val latest = chgNorm
        .groupBy(col(keyCol))
        .agg(max_by(struct((rest.map(col) :+ col("_op")): _*), col("_seq"))
          .as("_row"))
      val untouched = base.join(
        broadcast(latest.select(col(keyCol))), Seq(keyCol), "left_anti")
      val upserts = latest
        .filter(col("_row._op") =!= OpDelete)
        .select(col(keyCol) +: rest.map(c => col(s"_row.$c").as(c)): _*)
      untouched.unionByName(upserts)
    } else {
      // Base rows rank below every change; among changes, higher seq wins.
      val baseTagged = base
        .withColumn("_op", lit("B"))
        .withColumn("_prio", lit(0L))
        .withColumn("_seq", lit(Long.MinValue))
        .select(payload.map(col) :+ col("_op") :+ col("_prio") :+
          col("_seq"): _*)
      val unioned = baseTagged.unionByName(
        chgNorm.withColumn("_prio", lit(1L))
          .select(payload.map(col) :+ col("_op") :+ col("_prio") :+
            col("_seq"): _*))
      unioned
        .groupBy(col(keyCol))
        .agg(max_by(struct((rest.map(col) :+ col("_op")): _*),
          struct(col("_prio"), col("_seq"))).as("_row"))
        .filter(col("_row._op") =!= OpDelete)
        .select(col(keyCol) +: rest.map(c => col(s"_row.$c").as(c)): _*)
    }
  }
}
