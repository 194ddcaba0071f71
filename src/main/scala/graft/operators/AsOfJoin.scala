package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: attach to each left row the LATEST right row with
  * right.ts <= left.ts for the same key (DuckDB/kdb ASOF JOIN semantics,
  * ties included) — or, in the FORWARD direction, the EARLIEST right row
  * with right.ts >= left.ts.
  *
  * Spark has no native as-of join; the naive encoding — range theta-join then
  * per-left-row max — materializes O(|L|·|matches|) rows before pruning. This
  * implementation is the scale-correct composition: TAG and UNION both sides,
  * ONE shuffle on the key, and a running `last(_, ignoreNulls)` window carries
  * the most recent right payload forward onto each left row. Cost is
  * sort-within-partition over |L|+|R| rows — the same shape Spark plans for
  * any window — and AQE handles hot keys.
  *
  * At equal timestamps the right row sorts FIRST (tag 0 < tag 1), which gives
  * the inclusive `right.ts <= left.ts` (backward) / `>=` (forward) semantics.
  * Forward is the same plan with the timestamp sort reversed — the running
  * window then carries the NEXT right payload backward onto each left row.
  */
object AsOfJoin {

  /** @param left      any columns, must contain `keyCol` and `tsCol`
    * @param right     must contain `keyCol`, `tsCol`, and `payloadCols`;
    *                  callers must pre-dedup to one row per (key, ts) if the
    *                  source can collide (make it deterministic)
    * @param payloadCols right columns to attach (null when no prior right row)
    * @param forward   false = latest right.ts <= left.ts (default);
    *                  true = earliest right.ts >= left.ts
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               forward: Boolean = false): DataFrame = {
    val leftCols = left.columns
    val payload = struct(payloadCols.map(col): _*)

    val payloadType = right.select(payloadCols.map(col): _*).schema
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__isLeft"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(payloadType).as("__r"))
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__isLeft"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      payload.as("__r"))

    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy("__k")
      .orderBy(tsOrder, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attachedCols: Seq[Column] =
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__last.$c").as(s"asof_$c"))

    l.unionByName(r)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
      .select(attachedCols: _*)
  }
}
