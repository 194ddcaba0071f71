package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket an event stream to a fixed grid per key,
  * densify the grid (emit a row for every bucket between the key's first and
  * last activity, not just the active ones), and forward-fill carried values
  * across the gaps — the batch analogue of a gap-tolerant downsampler and the
  * standard preparation step before any per-key sequence model or charting
  * query.
  *
  * Spark-first shape, in three declarative stages:
  *  1. per-(key, bucket) aggregation — ONE shuffle on (key, bucket), map-side
  *     combinable; raw events never survive past this stage, so the dense
  *     grid is built over pre-aggregated rows only;
  *  2. spine generation — per-key min/max bucket (an aggregation over the
  *     stage-1 output, tiny) exploded through `sequence()`: spine size is
  *     (time-range / step) rows per key, independent of the event count —
  *     at 100 TB of events the spine is still only O(keys × buckets);
  *  3. left join spine ← aggregates on (key, bucket) + a per-key ordered
  *     window for the forward fill. AQE plans the join; the window's
  *     partition key is the resample key, so state is one key's grid.
  *
  * The forward fill is `last(value, ignoreNulls)` over the bucket order —
  * exact-decimal carried values, so the fill is bit-reproducible.
  */
object Resample {

  /** Bucket epoch-seconds column to a `step`-second grid. */
  def bucket(epochSeconds: Column, step: Long): Column =
    floor(epochSeconds / step) * step

  /** Densified per-(key, bucket) grid over `df`:
    * `n` = rows in the bucket (0 on gap rows), `total` = exact decimal sum of
    * `valueCol` in the bucket (null on gaps), `filled_total` = forward-filled
    * `total`. `epochCol` must be epoch seconds (long/double). */
  def gapFill(df: DataFrame, keyCol: String, epochCol: Column,
              valueCol: Column, step: Long): DataFrame = {
    val perBucket = df
      .groupBy(col(keyCol), bucket(epochCol, step).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(valueCol.cast("decimal(30,2)")).as("total"))

    val spine = perBucket
      .groupBy(col(keyCol))
      .agg(min("bucket").as("mn"), max("bucket").as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), lit(step))).as("bucket"))

    val byKey = Window.partitionBy(keyCol).orderBy("bucket")
    spine
      .join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("total"), ignoreNulls = true).over(byKey)
          .cast("double").as("filled_total"))
  }
}
