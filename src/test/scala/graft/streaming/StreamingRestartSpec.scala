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
    // recovered watermark, or they would be legitimately dropped as late.
    // The cut is derived from WINDOW BOUNDARIES, not a fixed fraction of the
    // time range: pick the latest 1-hour window that (a) holds ≥2 distinct
    // event times — so a cut between them splits the window's state across
    // the restart — and (b) ends more than the 30-minute horizon before max
    // ts — so the recovered watermark finalizes it in phase 2. A
    // fixed-fraction cut could satisfy neither on a regenerated fixture
    // with a short or skewed time spread.
    val horizonUs = 1800L * 1000000L
    val winUs = 3600L * 1000000L
    val tsUs = events.select(unix_micros(col("ts")).as("us")).as[Long].collect()
    val maxUs = tsUs.max
    val byWin = tsUs.groupBy(us => us / winUs * winUs)
    val wStart = byWin.collect {
      case (w, ts) if ts.distinct.length >= 2 && w + winUs + horizonUs < maxUs => w
    } match {
      case ws if ws.nonEmpty => ws.max
      case _ => fail("fixture time-spread too narrow: no 1-hour window has " +
        "2+ distinct event times and ends a full horizon before max ts")
    }
    val cut = byWin(wStart).max // last event in the target window

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
    // the cut was CONSTRUCTED inside this window, so it must have straddled
    // and emitted — a guaranteed-positive form of the check above
    assert(emitted.exists(_._1 == wStart / 1000000L),
      s"target straddling window ${wStart / 1000000L} was not emitted")
  }

  test("transformWithState timer sessions: killed mid-session, the resumed " +
      "checkpoint closes the straddling session once with full counts") {
    val base = tmp()
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val events = Tables.events(spark, sfDir)
    val gapUs = 1800L * 1000000L     // sessionizeTws default 30-minute gap
    val horizonUs = 7200L * 1000000L // and 2-hour watermark horizon

    // batch sessionization in plain Scala: per user, sorted, split on gap
    val rows = events.select($"user_id", unix_micros($"ts").as("us"))
      .as[(Long, Long)].collect()
    val maxUs = rows.map(_._2).max
    def sessionsOf(ts: Seq[Long]): List[List[Long]] =
      ts.sorted.toList match {
        case h :: t => t.foldLeft(List(List(h))) { (acc, u) =>
          if (u - acc.head.head > gapUs) List(u) :: acc
          else (u :: acc.head) :: acc.tail
        }.map(_.reverse).reverse
        case Nil => Nil
      }
    val batchSessions = rows.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      sessionsOf(rs.map(_._2).toSeq)
        .map(s => (uid, s.head, s.length.toLong, s.last))
    } // (user, start_us, n_events, last_us)

    // straddle target: a session with ≥2 distinct event times (so a cut at
    // its LAST event leaves real phase-1 state to recover) whose timer close
    // is guaranteed before end of input (last + gap + horizon, with 2 s
    // slack for the ms timer rounding, inside max ts)
    val target = batchSessions.filter(s => s._3 >= 2 && s._2 != s._4 &&
        s._4 + gapUs + horizonUs + 2000000L < maxUs)
      .maxByOption(_._4)
      .getOrElse(fail("fixture time-spread too narrow: no closable session " +
        "with 2+ distinct event times exists"))
    val cut = target._4

    events.filter(unix_micros($"ts") < cut).coalesce(1).write.parquet(in)
    def run(): Unit = Streaming.withRocksDb(spark) {
      val q = Streaming.sessionizeTws(
          spark.readStream.schema(spark.read.parquet(in).schema)
            .option("maxFilesPerTrigger", 1).parquet(in))
        .toDF()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // killed mid-session: the target session's last event is not yet in
    events.filter(unix_micros($"ts") >= cut).coalesce(1)
      .write.mode("append").parquet(in)
    run() // a NEW query object resumes the same checkpoint (RocksDB state)

    val log = spark.read.parquet(out)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // the straddling session closes exactly once, with the full batch count —
    // its phase-1 state (open session + pending timer) survived the restart
    val closes = log.filter(r => r._1 == target._1 && r._2 == target._2 && r._4)
    assert(closes.length == 1,
      s"straddling session closed ${closes.length} times (want exactly 1)")
    assert(closes.head._3 == target._3,
      s"straddler closed with ${closes.head._3} events, batch says ${target._3}")
    // and the whole update-log rollup still equals batch sessionization
    val rolled = log.groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(_._3).max).toMap
    val batchMap = batchSessions.map(s => (s._1, s._2) -> s._3).toMap
    assert(rolled == batchMap,
      "rolled-up session log diverges from batch sessionization after restart")
  }

  test("foreachBatch MERGE upsert: crashed mid-replay, the resumed stream " +
       "converges to the one-shot batch merge bit-for-bit") {
    // The q_stream_upsert recipe (foreachBatch + MergeInto over a parquet
    // snapshot) under the failure it must survive at 100 TB: the job dies
    // BETWEEN micro-batches mid-replay, a new query object resumes the
    // checkpoint, and the final snapshot must equal the one-shot batch
    // MERGE. The uncommitted batch is re-delivered on restart (at-least-once
    // from the offset log) and converges because the change rows carry
    // absolute values — MergeInto re-application is idempotent per key.
    val base = tmp()
    val (chgDir, snapDir, ckpt) = (s"$base/chg", s"$base/snap", s"$base/ckpt")
    val o = Tables.orders(spark, sfDir)
    val price = col("o_totalprice").cast("decimal(30,2)")
    val baseDf = o.filter(col("o_orderkey") % 4 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), price.as("price"))
    val changes = o.filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"), lit("I").as("op"), col("o_orderstatus"),
        price.as("price"))
      .unionByName(o.filter(col("o_orderkey") % 4 === 1)
        .select(col("o_orderkey"), lit("U").as("op"), col("o_orderstatus"),
          (price + 10).cast("decimal(30,2)").as("price")))
      .unionByName(o.filter(col("o_orderkey") % 4 === 2)
        .select(col("o_orderkey"), lit("D").as("op"), col("o_orderstatus"),
          lit(null).cast("decimal(30,2)").as("price")))
    baseDf.write.parquet(snapDir)
    // three change files = three micro-batches at maxFilesPerTrigger=1;
    // key-disjoint op classes, so batch order cannot affect the result
    for (op <- Seq("I", "U", "D"))
      changes.filter(col("op") === op).coalesce(1)
        .write.mode("append").parquet(chgDir)

    val applied = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(crashAtBatch: Long): Unit = {
      val applyBatch: (DataFrame, Long) => Unit = (batch, id) => {
        if (applied.length.toLong == crashAtBatch)
          throw new RuntimeException("injected crash before batch side effect")
        val next = graft.operators.MergeInto(
          spark.read.parquet(snapDir), batch, "o_orderkey")
        val tmpDir = s"${snapDir}_b${System.nanoTime()}"
        next.write.mode("overwrite").parquet(tmpDir)
        spark.read.parquet(tmpDir).write.mode("overwrite").parquet(snapDir)
        applied += id
      }
      val q = spark.readStream.schema(spark.read.parquet(chgDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(chgDir)
        .writeStream.foreachBatch(applyBatch)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        assert(e.getMessage.contains("injected crash") ||
               Option(e.getCause).exists(_.getMessage.contains("injected crash")),
          s"unexpected stream failure: $e")
      }
    }
    run(crashAtBatch = 1L) // batch 0 commits; the crash kills the run mid-replay
    assert(applied.length == 1, s"phase 1 must commit exactly one batch: $applied")
    val midCount = spark.read.parquet(snapDir).count()
    run(crashAtBatch = -1L) // resume: re-delivers batch 1, then batch 2 — never batch 0
    assert(applied.length == 3,
      s"resume must apply exactly the two remaining batches, once each: $applied")

    def canon(df: DataFrame): Seq[(Long, String, Option[String])] =
      df.select(col("o_orderkey").cast("long"), col("o_orderstatus"),
          col("price").cast("string"))
        .as[(Long, String, Option[String])].collect().sortBy(_._1).toSeq
    val got = canon(spark.read.parquet(snapDir))
    val want = canon(graft.operators.MergeInto(baseDf, changes, "o_orderkey"))
    // the D batch (applied only after the resume) shrinks the table, so the
    // crashed phase-1 snapshot must be a genuine partial state
    assert(midCount != want.length, "phase 1 must be a genuine partial state")
    assert(got == want,
      s"restarted upsert diverges from batch MERGE: ${got.length} vs ${want.length}")
  }
}
