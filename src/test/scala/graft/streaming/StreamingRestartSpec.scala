package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint-recovery contract: a file-source stream terminated after a
  * partial run and RESTARTED from its checkpoint must neither lose nor
  * duplicate rows — the durability guarantee a 100 TB ingestion pipeline
  * leans on across executor loss and job redeploys. The mechanisms under
  * test are the file source's offset log (which files are consumed), the
  * parquet sink's commit log (_spark_metadata, which files are visible to
  * readers), and — for the watermarked variant — the state store restored
  * from the checkpoint. StreamingSpec proves single-run semantics; this
  * suite is the only place a SECOND query object resumes the first one's
  * checkpoint. */
class StreamingRestartSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_restart_").toString

  private def runOnce(in: String, out: String, ckpt: String,
                      transform: DataFrame => DataFrame): Unit = {
    val q = transform(
        spark.readStream.schema(spark.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 1).parquet(in))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("restart from checkpoint is exactly-once for a stateless projection") {
    val base = tmp()
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val events = Tables.events(spark, sfDir)

    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(in)
    runOnce(in, out, ckpt, _.select("event_id", "user_id"))
    val afterPhase1 = spark.read.parquet(out).count()

    // second file lands while the query is DOWN; a new query object resumes
    // the same checkpoint and must consume only the unseen file
    events.filter(col("event_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(in)
    runOnce(in, out, ckpt, _.select("event_id", "user_id"))

    val got = spark.read.parquet(out).select("event_id").as[Long].collect().sorted.toSeq
    val want = events.select("event_id").as[Long].collect().sorted.toSeq
    assert(afterPhase1 > 0 && afterPhase1 < want.length,
      s"phase 1 must be a real partial run: $afterPhase1 of ${want.length}")
    assert(got == want,
      s"restart lost or duplicated rows: ${got.length} vs ${want.length}")
  }

  test("restarted watermarked aggregation recovers state, emits each window once") {
    val base = tmp()
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val events = Tables.events(spark, sfDir)
    // time split (not id split): phase-2 rows must be NEWER than the
    // recovered watermark, or they would be legitimately dropped as late
    val cut = events.agg(
      (unix_micros(min(col("ts"))) +
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) * 6 / 10))
        .cast("long").as("c")).head.getLong(0)

    events.filter(unix_micros(col("ts")) < cut).coalesce(1).write.parquet(in)
    runOnce(in, out, ckpt,
      df => Streaming.tumblingAggWatermarked(df, horizon = "30 minutes"))

    events.filter(unix_micros(col("ts")) >= cut).coalesce(1)
      .write.mode("append").parquet(in)
    runOnce(in, out, ckpt,
      df => Streaming.tumblingAggWatermarked(df, horizon = "30 minutes"))

    val emitted = spark.read.parquet(out)
      .as[(Long, String, Long, Double)].collect().toSeq
    val batch = Streaming.tumblingAgg(events)
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap

    assert(emitted.nonEmpty, "no windows emitted across both runs")
    val keys = emitted.map(r => (r._1, r._2))
    assert(keys.distinct.length == keys.length,
      "a window/key pair was emitted twice across the restart")
    // every emitted row must carry the FULL batch-equivalent aggregate —
    // including windows that straddled the cut, whose partial phase-1 state
    // had to survive the restart to produce the right count
    emitted.foreach { r =>
      assert(batch.get((r._1, r._2)).contains(r),
        s"emitted row $r disagrees with batch twin ${batch.get((r._1, r._2))}")
    }
    val straddlers = emitted.filter(r => r._1 * 1000000L < cut &&
      (r._1 + 3600L) * 1000000L > cut)
    assert(straddlers.nonEmpty,
      "no window straddled the restart cut — state recovery not exercised")
  }
}
