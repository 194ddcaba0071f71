package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface: batch/stream parity on the real events table,
  * session windows, and watermark late-data semantics via MemoryStream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling agg equals batch tumbling agg on events") {
    val batch = Streaming.tumblingAgg(Tables.events(spark, sfDir))
      .orderBy("window_start", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    val stream = Streaming.replayToTable(
        Streaming.tumblingAgg(Streaming.eventStream(spark, sfDir)),
        "t_parity_tumbling")
      .orderBy("window_start", "event_type")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("streaming session windows: per-user session counts match lag() batch logic") {
    val streamed = Streaming.replayToTable(
        Streaming.sessionAgg(Streaming.eventStream(spark, sfDir)),
        "t_parity_sessions")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us")
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_session",
        when(col("us") - lag("us", 1).over(w) >= 1800000000L ||
          lag("us", 1).over(w).isNull, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum("new_session").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = Streaming.tumblingAggWatermarked(
      mem.toDF().toDF("ts", "value").withColumn("event_type", lit("x")),
      horizon = "1 hour")
    val q = agg.writeStream.format("memory").queryName("t_watermark")
      .outputMode("append").start()

    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    mem.addData((t(1), 1.0))
    q.processAllAvailable()
    // advance watermark far past hour 1: max ts 10:30 → watermark 09:30
    mem.addData((t(10), 5.0))
    q.processAllAvailable()
    // late event for hour 1 — behind watermark, must be DROPPED
    mem.addData((t(1), 100.0))
    q.processAllAvailable()
    // close hour 10's window too
    mem.addData((Timestamp.valueOf("2024-01-01 23:00:00"), 7.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_watermark")
      .select("window_start", "total").as[(Long, Double)].collect().toMap
    val hour1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime / 1000
    assert(rows(hour1) == 1.0, s"late row must not be counted: $rows")
  }

  test("foreachBatch parquet sink: batch-id overwrite is replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_feb").toString
    try {
      val stream = Streaming.eventStream(spark, sfDir)
        .select("event_id", "user_id", "value")
      val nBatches = Streaming.foreachBatchToParquet(stream, dir)
      assert(nBatches >= 1)
      val written = spark.read.parquet(dir)
      val batch = graft.io.Tables.events(spark, sfDir)
      assert(written.count() == batch.count())
      // replaying a batch overwrites its own directory, not appends: simulate
      // by re-writing batch 0's payload through the same convention
      val b0 = spark.read.parquet(s"$dir/batch_id=0").cache()
      b0.count() // materialize before overwriting the files it reads
      b0.write.mode("overwrite").parquet(s"$dir/batch_id=0")
      b0.unpersist(blocking = true)
      assert(spark.read.parquet(dir).count() == batch.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("transformWithState accumulates per-user state across micro-batches " +
      "on the RocksDB store") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    Streaming.withRocksDb(spark) {
      val out = Streaming.runningUserStateTws(
        mem.toDF().toDF("user_id", "ts", "value"))
      val q = out.toDF().writeStream.format("memory").queryName("t_tws")
        .outputMode("update").start()
      mem.addData((1L, t(1), 10.0), (2L, t(1), 1.0))
      q.processAllAvailable()
      mem.addData((1L, t(2), 5.0)) // u1's state must carry n=1, total=10
      q.processAllAvailable()
      q.stop()
    }
    val finals = spark.table("t_tws")
      .groupBy("user_id")
      .agg(max("n_events").as("n"), max("total").as("total"),
        max("last_us").as("last_us"))
      .as[(Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(finals(1L) == ((1L, 2L, 15.0, t(2).getTime * 1000L)))
    assert(finals(2L) == ((2L, 1L, 1.0, t(1).getTime * 1000L)))
  }

  test("flatMapGroupsWithState sessionizer: gap-close, cross-batch extend, " +
      "event-time-timeout close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val out = Streaming.sessionizeStateful(
      mem.toDF().toDF("user_id", "ts"), gapMinutes = 30, horizon = "1 hour")
    val q = out.toDF().writeStream.format("memory")
      .queryName("t_fmgws_sessions").outputMode("update").start()

    // batch 1: u1 two events 10 min apart → one open session of 2
    mem.addData((1L, t(0, 0)), (1L, t(0, 10)))
    q.processAllAvailable()
    // batch 2: u1 extends (gap 20 min); u2 starts
    mem.addData((1L, t(0, 30)), (2L, t(0, 30)))
    q.processAllAvailable()
    // batch 3: u1 jumps 2 h ahead → old session closes by GAP, new one opens;
    // the advanced watermark (1:30) also times out u2's idle session
    mem.addData((1L, t(2, 30)))
    q.processAllAvailable()
    mem.addData((1L, t(5, 0))) // extra batch so the timeout actually fires
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("t_fmgws_sessions")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    def us(h: Int, m: Int) = t(h, m).getTime * 1000L
    // rollup = final session set
    val finals = rows.groupBy(r => (r._1, r._2))
      .map { case (k, v) => (k._1, k._2, v.map(_._3).max) }.toSet
    assert(finals == Set(
      (1L, us(0, 0), 3L),  // u1 session 1: 0:00,0:10,0:30
      (1L, us(2, 30), 1L), // u1 session 2 (gap-closed predecessor)
      (1L, us(5, 0), 1L),
      (2L, us(0, 30), 1L)))
    // u1's first session was closed by the GAP path, u2's by the TIMEOUT path
    assert(rows.contains((1L, us(0, 0), 3L, true)))
    assert(rows.contains((2L, us(0, 30), 1L, true)))
  }

  test("left-outer stream-stream join: unmatched rows emit null-padded " +
      "after the watermark, matched rows as they pair") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val out = Streaming.followWithinOuter(
      mem.toDF().toDF("user_id", "ts", "event_type"),
      "click", "purchase", within = "30 minutes", horizon = "1 hour")
    val q = out.toDF().writeStream.format("memory").queryName("t_outer_join")
      .outputMode("append").start()

    // u1 clicks then purchases in-window; u2 clicks with NO purchase
    mem.addData((1L, t(1, 0), "click"), (2L, t(1, 0), "click"),
      (1L, t(1, 10), "purchase"))
    q.processAllAvailable()
    // advance watermark far past u2's click+window (needs ts > 2:30 + 1h)
    mem.addData((9L, t(5, 0), "click"))
    q.processAllAvailable()
    mem.addData((9L, t(8, 0), "click")) // one more batch to flush state
    q.processAllAvailable()
    q.stop()

    def us(h: Int, m: Int) = t(h, m).getTime * 1000L
    val rows = spark.table("t_outer_join")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(rows.contains((1L, us(1, 0), Some(us(1, 10)))), rows.toString)
    assert(rows.contains((2L, us(1, 0), None)),
      s"unmatched click not null-padded after watermark: $rows")
  }

  test("stream-stream time-bounded join equals the batch self-join") {
    val streamed = Streaming.replayToTable(
        Streaming.followWithin(Streaming.eventStream(spark, sfDir), "click", "purchase"),
        "t_stream_join", mode = "append")
      .select("user_id", "first_us", "then_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val batch = Streaming.followWithin(
        graft.io.Tables.events(spark, sfDir), "click", "purchase")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup: exact across batches; watermarked variant evicts state") {
    implicit val sqlCtx = spark.sqlContext
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

    // exact dedup: duplicate keys across batches emit once
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = Streaming.dedupKeys(mem.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("t_dedup_exact")
      .outputMode("append").start()
    mem.addData((t(1), 1L, "a"), (t(1), 1L, "a"), (t(1), 2L, "b"))
    q.processAllAvailable()
    mem.addData((t(2), 1L, "a")) // dup in a later batch — state must remember
    q.processAllAvailable()
    q.stop()
    assert(spark.table("t_dedup_exact").count() == 2)

    // watermarked dedup: dup within horizon dropped; key re-emitted once the
    // first sighting's state has been evicted past the watermark
    val mem2 = MemoryStream[(Timestamp, Long, String)]
    val q2 = Streaming.dedupKeysWithinWatermark(
        mem2.toDF().toDF("ts", "user_id", "event_type"), horizon = "1 hour")
      .writeStream.format("memory").queryName("t_dedup_wm")
      .outputMode("append").start()
    mem2.addData((t(1), 1L, "a"))
    q2.processAllAvailable()
    mem2.addData((t(1), 1L, "a")) // within horizon → dropped
    q2.processAllAvailable()
    mem2.addData((t(10), 9L, "z")) // watermark → 09:30, evicts key (1,a)
    q2.processAllAvailable()
    mem2.addData((t(11), 1L, "a")) // same key, state gone → emitted again
    q2.processAllAvailable()
    q2.stop()
    val emitted = spark.table("t_dedup_wm")
      .select("user_id", "event_type").as[(Long, String)].collect().toSeq
    assert(emitted.count(_ == (1L, "a")) == 2,
      s"key must re-emit after state eviction: $emitted")
    assert(emitted.size == 3)
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double, Timestamp)]
    val events = mem.toDF().toDF("user_id", "value", "ts")
    val q = Streaming.runningUserState(events).toDF()
      .writeStream.format("memory").queryName("t_stateful")
      .outputMode("update").start()

    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((1L, 2.0, t(0)), (1L, 3.0, t(1)), (2L, 5.0, t(2)))
    q.processAllAvailable()
    mem.addData((1L, 10.0, t(5))) // second batch: user 1 state must carry over
    q.processAllAvailable()
    q.stop()

    val full = spark.table("t_stateful")
      .as[(Long, Long, Double, Long)].collect()
    assert(full.exists(r => r._1 == 1L && r._2 == 3 && r._3 == 15.0),
      s"user 1 final state must be count=3 total=15: ${full.toSeq}")
    assert(full.exists(r => r._1 == 2L && r._2 == 1 && r._3 == 5.0))
  }

  test("eventStream respects maxFilesPerTrigger backpressure config") {
    val s = Streaming.eventStream(spark, sfDir, maxFilesPerTrigger = 2)
    assert(s.isStreaming)
    assert(s.schema.fieldNames.contains("ts"))
  }

  test("streaming parquet file sink: watermarked append writes closed windows") {
    val out = "/tmp/graft_test_stream_sink"
    val ckpt = "/tmp/graft_test_stream_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val q = Streaming.tumblingAggWatermarked(
        Streaming.eventStream(spark, sfDir), horizon = "2 hours")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val written = spark.read.parquet(out)
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = Streaming.tumblingAgg(Tables.events(spark, sfDir))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(written.nonEmpty, "file sink wrote no rows")
    // append mode emits only watermark-closed windows: subset of batch result,
    // equal on every window it did emit
    assert(written.subsetOf(batch), "file-sink rows disagree with batch twin")
  }
}
