package graft.streaming

import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY §2.13 — a NEW surface;
  * the reference has no streaming at all, its batch similarity model's natural
  * incremental analogue).
  *
  * Design: every windowed aggregation is ONE function over a DataFrame that
  * works identically for a batch frame and a `readStream` frame — the Spark
  * way to guarantee batch/stream parity (same logical plan, Catalyst plans the
  * incremental version). The batch twins in graft.queries.EventQueries are the
  * DuckDB-oracle surface; [[replayToTable]] proves the streaming path produces
  * the same rows.
  *
  * Scale: file-source streaming with `maxFilesPerTrigger` backpressure and
  * watermarked state eviction is exactly the 100 TB ingestion shape — state
  * store size is bounded by (watermark horizon × key cardinality), not input
  * size.
  */
object Streaming {

  /** events.parquet at-rest schema: ts is TIMESTAMP(NANOS) which surfaces as
    * LongType under nanosAsLong (see graft.io.Tables.events). */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming scan of the events parquet data; ts re-derived to microsecond
    * TimestampType (same transform as the batch reader). The file source needs
    * a directory, and the testdata ships single-file tables — pathGlobFilter
    * scopes the directory scan to the events file(s). */
  def eventStream(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(rawEventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "events.parquet*")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  // ---- window aggregations: one definition, batch AND streaming ----

  /** Tumbling 1-hour window per event_type (batch twin: q_window_tumbling). */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("total"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Sliding 1-hour window, 30-minute slide (batch twin: q_window_sliding). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("total"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("n"), col("total"))

  /** Session windows with a 30-minute inactivity gap per user (batch twin:
    * q_sessionize counts the same sessions via lag()). */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"))

  /** Watermarked variant for bounded state / append-mode sinks: events later
    * than `horizon` behind the max seen ts are dropped from state. */
  def tumblingAggWatermarked(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    tumblingAgg(events.withWatermark("ts", horizon))

  /** Run a streaming aggregation to completion against the finite test input
    * (AvailableNow trigger + memory sink) and return the result table —
    * the bridge that lets the driver's batch oracle check streaming results. */
  def replayToTable(agg: DataFrame, tableName: String): DataFrame = {
    val q = agg.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    agg.sparkSession.table(tableName)
  }
}
