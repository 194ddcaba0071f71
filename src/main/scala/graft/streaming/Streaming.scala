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

  /** Streaming scan of the events parquet data. The file source requires a
    * user-supplied schema, and the fixture's physical ts encoding has drifted
    * across generations (TIMESTAMP(NANOS)-as-Long, TIMESTAMP_NTZ, plain
    * TIMESTAMP) — so NEVER hardcode it: probe the actual footer through the
    * batch reader (one driver-side metadata read, no data scan), feed that
    * schema to readStream, and normalize ts with the SAME shared transform
    * the batch path uses ([[Tables.normalizeEventTs]]). Batch and stream
    * cannot disagree about the fixture by construction. The file source needs
    * a directory, and the testdata ships single-file tables — pathGlobFilter
    * scopes the directory scan to the events file(s). */
  def eventStream(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int = 8): DataFrame = {
    val footerSchema = spark.read
      .option("pathGlobFilter", "events.parquet*")
      .parquet(dir).schema
    Tables.normalizeEventTs(
      spark.readStream
        .schema(footerSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .option("pathGlobFilter", "events.parquet*")
        .parquet(dir))
  }

  /** Streaming scan of the documents parquet data — the SURVEY §2.13 "new
    * bills arriving vs a static corpus" ingestion shape: corpus-hygiene
    * operators run over this stream exactly as over the batch frame. Schema
    * probed from the real footer, same as [[eventStream]] — never a
    * hardcoded literal that fixture regeneration can silently invalidate. */
  def docStream(spark: SparkSession, dir: String,
                maxFilesPerTrigger: Int = 8): DataFrame = {
    val footerSchema = spark.read
      .option("pathGlobFilter", "documents.parquet*")
      .parquet(dir).schema
    spark.readStream
      .schema(footerSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "documents.parquet*")
      .parquet(dir)
  }

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

  /** UNION of two streams + aggregation: the multi-source ingestion shape —
    * independent readStream sources (here two typed slices of the event
    * firehose; in production two kafka topics / file feeds) merged with
    * unionByName into one complete-mode aggregation. Stateless union, state
    * only in the aggregation. Batch twin: UNION ALL of the same slices. */
  def unionStreamsAgg(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("total"))

  /** STREAM-STATIC join + aggregation: enrich each event with a static
    * dimension row (broadcast hash join — the static side is planned once,
    * no state), then aggregate per segment. The join is stateless, so only
    * the aggregation holds state: O(segments), independent of stream length.
    * This is the canonical streaming-enrichment shape at scale — dimension
    * tables broadcast, fact stream flows through untouched. Works identically
    * on a batch events frame (the oracle surface). */
  def streamStaticAgg(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
        broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,2)")).cast("double").as("total"))
      .select(col("c_mktsegment").as("segment"), col("n"), col("total"))

  /** CHAINED windowed aggregations — two stateful operators in one streaming
    * query (Spark ≥3.4): 30-minute tumbling per-user counts, re-aggregated
    * into 1-hour windows of (distinct active user-slots, total events, max
    * per-user burst). `window_time()` re-derives the event-time column from
    * the first window so the watermark propagates through both operators.
    * Append mode: the first aggregation only EMITS a window downstream once
    * the watermark passes its end, so on a finite replay the trailing
    * `horizon` of windows is undecided — callers restrict to the decidable
    * region (see q_stream_chained_agg). */
  def chainedWindowAgg(events: DataFrame, horizon: String = "2 hours"): DataFrame =
    events.withWatermark("ts", horizon)
      .groupBy(window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(window_time(col("window")), "1 hour"))
      .agg(count(lit(1)).as("n_user_slots"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_user_n"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("n_user_slots"), col("n_events"), col("max_user_n"))

  /** Run a streaming aggregation to completion against the finite test input
    * (AvailableNow trigger + memory sink) and return the result table —
    * the bridge that lets the driver's batch oracle check streaming results. */
  def replayToTable(agg: DataFrame, tableName: String,
                    mode: String = "complete"): DataFrame = {
    val spark = agg.sparkSession
    // Stateful ops pin the shuffle-partition count into the checkpoint at
    // query start; each state partition carries a state-store instance whose
    // per-batch commit is the dominant fixed cost on finite replays. The
    // replay checkpoint is fresh every call, so a smaller pinned count is
    // purely a runtime choice (results identical, state size unchanged).
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val pinned = math.min(scala.util.Try(prev.toInt).getOrElse(8), 8)
    spark.conf.set("spark.sql.shuffle.partitions", pinned.toString)
    try {
      val q = agg.writeStream
        .format("memory")
        .queryName(tableName)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(tableName)
  }

  /** Stream-stream inner join: for every `firstType` event, the `thenType`
    * events of the SAME user within `within` afterwards (funnel/attribution
    * shape, e.g. click → purchase). Both sides carry watermarks and the join
    * condition bounds event-time distance, so each side's buffered state is
    * evicted once the other side's watermark passes — state is
    * O(events per horizon), the stream-stream-join contract at scale.
    * Works identically on a batch frame (watermark is a no-op there): the
    * batch run IS the oracle surface. */
  def followWithin(events: DataFrame, firstType: String, thenType: String,
                   within: String = "30 minutes",
                   horizon: String = "2 hours"): DataFrame = {
    // watermark BEFORE the type filter: each side's watermark then advances
    // with EVERY event, not just its own type's arrivals — filter-first would
    // freeze the global watermark (min of both sides) whenever one type goes
    // quiet, pinning join state (and, in the outer variant, never emitting
    // unmatched rows)
    val wm = events.withWatermark("ts", horizon)
    val a = wm.filter(col("event_type") === firstType)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = wm.filter(col("event_type") === thenType)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b, col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .select(col("a_user").as("user_id"),
        unix_micros(col("a_ts")).as("first_us"),
        unix_micros(col("b_ts")).as("then_us"))
  }

  /** LEFT OUTER variant of [[followWithin]]: every `firstType` event emits —
    * matched rows as they pair up, UNMATCHED rows null-padded only once the
    * watermark proves no in-window `thenType` event can still arrive (the
    * outer-join-on-streams contract: "no match" is only decidable
    * watermark-late). Batch execution degenerates to a plain left outer
    * join, which is the oracle surface. */
  def followWithinOuter(events: DataFrame, firstType: String, thenType: String,
                        within: String = "30 minutes",
                        horizon: String = "2 hours"): DataFrame = {
    val wm = events.withWatermark("ts", horizon)
    val a = wm.filter(col("event_type") === firstType)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"))
    val b = wm.filter(col("event_type") === thenType)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b, col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"), "leftOuter")
      .select(col("a_user").as("user_id"),
        unix_micros(col("a_ts")).as("first_us"),
        unix_micros(col("b_ts")).as("then_us"))
  }

  /** Streaming exact dedup by key — the streaming-ingestion face of the
    * dedup family: emits each (user_id, event_type) the first time it is
    * seen, exact across all micro-batches (state = full key set; exact-dedup
    * contract, same answer as batch DISTINCT). */
  def dedupKeys(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")

  /** Bounded-state variant: duplicates are only suppressed while the first
    * sighting is within the watermark horizon; state for keys older than the
    * watermark is evicted. The 100 TB shape — state size is
    * O(keys per horizon), not O(all keys ever) — at the cost of re-emitting a
    * key whose duplicates arrive further apart than `horizon`. */
  def dedupKeysWithinWatermark(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .select(col("ts"), col("user_id"), col("event_type"))
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Per-user running state via mapGroupsWithState (the custom-state surface
    * of SURVEY §2.13): event count, value sum, and max event time per user,
    * carried in an explicit GroupState across micro-batches. State size is
    * O(users), independent of input size — the bounded-state contract that
    * matters at 100 TB of events. */
  final case class UserState(n_events: Long, total: Double, last_us: Long)
  final case class UserRunning(user_id: Long, n_events: Long, total: Double, last_us: Long)

  def runningUserState(events: DataFrame): org.apache.spark.sql.Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid, rows, state) =>
          var s = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          rows.foreach { case (_, v, us) =>
            s = UserState(s.n_events + 1, s.total + v, math.max(s.last_us, us))
          }
          state.update(s)
          UserRunning(uid, s.n_events, s.total, s.last_us)
      }
  }

  /** foreachBatch sink with batch-id idempotence — the arbitrary-sink
    * surface: each micro-batch lands in `dir/batch_id=<id>` with
    * mode=overwrite, so a REPLAYED batch (restart after a sink failure,
    * before the checkpoint commit) overwrites its own previous attempt
    * instead of appending duplicates. That id-keyed overwrite is the
    * standard exactly-once recipe for sinks without transactional commit;
    * readers glob the directory and see each batch exactly once. Returns the
    * number of batches written. */
  def foreachBatchToParquet(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val count = spark.sparkContext.longAccumulator("graft.batches")
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/batch_id=$id")
        count.add(1L)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    count.value
  }

  /** Per-user running aggregate on transformWithState (Spark 4's arbitrary-
    * state API, successor to [map|flatMap]GroupsWithState): typed ValueState
    * behind a StatefulProcessor, RocksDB-backed — the state store that
    * actually holds 100 TB-scale key spaces (spillable, incremental
    * checkpoint), where the HDFS-backed store keeps all state on heap. Same
    * semantics and oracle as [[runningUserState]]; TTLConfig.NONE here, but
    * the same handle takes a TTL so idle users age out without timer
    * plumbing. */
  class UserStateProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, (Long, Double, Long), UserRunning] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[UserState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState]("running",
        org.apache.spark.sql.Encoders.product[UserState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Double, Long)],
        timers: TimerValues): Iterator[UserRunning] = {
      var s = if (state.exists()) state.get() else UserState(0L, 0.0, Long.MinValue)
      rows.foreach { case (_, v, us) =>
        s = UserState(s.n_events + 1, s.total + v, math.max(s.last_us, us))
      }
      state.update(s)
      Iterator.single(UserRunning(uid, s.n_events, s.total, s.last_us))
    }
  }

  def runningUserStateTws(events: DataFrame): org.apache.spark.sql.Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserStateProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Sessionization rebuilt on transformWithState with EVENT-TIME TIMERS —
    * the Spark 4 successor to [[sessionizeStateful]]'s GroupStateTimeout:
    * the quiet-period close is an explicit per-key timer (registered at
    * last_event + gap, superseded on every new event), and
    * handleExpiredTimer emits the closed session and frees its state when
    * the watermark passes. Same emission protocol and oracle as
    * [[sessionizeStateful]]: update-mode log, final row per session carries
    * max n_events, so the batch rollup recovers exact sessionization. */
  class TimerSessionProcessor(gapUs: Long) extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var sess: ValueState[OpenSession] = _

    private def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
        timers: TimerValues): Iterator[SessionOut] = {
      val ts = rows.map(r => us(r._2)).toArray.sorted
      val out = List.newBuilder[SessionOut]
      var s = if (sess.exists()) sess.get() else OpenSession(ts.head, ts.head, 0L)
      // one live timer per key: drop the pending close before re-registering
      getHandle.listTimers().toList
        .foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      ts.foreach { u =>
        if (u - s.last_us > gapUs) {
          out += SessionOut(uid, s.start_us, s.n_events, closed = true)
          s = OpenSession(u, u, 1L)
        } else
          // out-of-order event (a later micro-batch may legally carry an
          // event older than last_us, up to the watermark): merge BOTH ends —
          // min into start_us, max into last_us — so the session bounds match
          // the globally-sorted batch oracle, not the arrival order
          s = OpenSession(math.min(s.start_us, u), math.max(s.last_us, u),
            s.n_events + 1)
      }
      sess.update(s)
      // round the µs deadline UP to ms: floor would let the timer fire (and
      // close the session) up to 1 ms before the gap has actually elapsed
      getHandle.registerTimer((s.last_us + gapUs + 999L) / 1000L)
      (out += SessionOut(uid, s.start_us, s.n_events, closed = false))
        .result().iterator
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      // guard: only close if this timer still matches the open session's
      // quiet period (robust to input-vs-timer ordering within a batch)
      if (sess.exists() && info.getExpiryTimeInMs >=
          (sess.get().last_us + gapUs + 999L) / 1000L) {
        val s = sess.get()
        sess.clear()
        Iterator.single(SessionOut(uid, s.start_us, s.n_events, closed = true))
      } else Iterator.empty
    }
  }

  /** Per-user event-type histogram on transformWithState + typed MapState —
    * the keyed-sub-state primitive (one map entry per event type under each
    * user key, individually updatable without rewriting the whole value).
    * Completes the state-type coverage: ValueState
    * ([[UserStateProcessor]]), timers ([[TimerSessionProcessor]]), MapState
    * here. Update-mode emission: every touched (user, type) pair re-emits
    * its current count; max n per pair rolls the log up to the batch
    * groupBy. */
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  class TypeHistogramProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, (Long, String), TypeCount] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig}
    @transient private var counts: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, String)],
        timers: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { case (_, t) =>
        val n = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, n + 1L)
        touched += t
      }
      touched.iterator.map(t => TypeCount(uid, t, counts.getValue(t)))
    }
  }

  def typeHistogramTws(events: DataFrame): org.apache.spark.sql.Dataset[TypeCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("user_id"), col("event_type"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new TypeHistogramProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Per-user trailing event-type window on transformWithState + typed
    * ListState — the ordered-sub-state primitive (append-only list, trimmed
    * to the last k entries; the state the "recent activity" features of a
    * serving pipeline keep). Rows are sorted (us, event_id) within each
    * batch so multi-batch replays append deterministically. Completes the
    * state-primitive coverage: ValueState, MapState, event-time timers,
    * ListState. */
  final case class RecentOut(user_id: Long, n_events: Long, recent: String)

  class RecentTypesProcessor(k: Int) extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, (Long, String, Long, Long), RecentOut] {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var recent: ListState[String] = _
    @transient private var total: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      recent = getHandle.getListState[String]("recent",
        org.apache.spark.sql.Encoders.STRING, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("total",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(uid: Long, rows: Iterator[(Long, String, Long, Long)],
        timers: TimerValues): Iterator[RecentOut] = {
      val sorted = rows.toArray.sortBy(r => (r._3, r._4))
      val prior = if (recent.exists()) recent.get().toArray else Array.empty[String]
      val all = prior ++ sorted.map(_._2)
      val trimmed = all.takeRight(k)
      recent.put(trimmed)
      val n = (if (total.exists()) total.get() else 0L) + sorted.length
      total.update(n)
      Iterator.single(RecentOut(uid, n, trimmed.mkString(",")))
    }
  }

  def recentTypesTws(events: DataFrame, k: Int = 3): org.apache.spark.sql.Dataset[RecentOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RecentTypesProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  def sessionizeTws(events: DataFrame, gapMinutes: Int = 30,
      horizon: String = "2 hours"): org.apache.spark.sql.Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val gapUs = gapMinutes * 60L * 1000000L
    // the watermark tag rides the TIMESTAMP attribute into the operator
    events.withWatermark("ts", horizon)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new TimerSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  /** transformWithState requires the RocksDB state store; scope the provider
    * override to one replay (the HDFS-backed default is faster for the tiny
    * finite replays every other gate query runs). */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Custom sessionization via flatMapGroupsWithState — the multi-output
    * arbitrary-state surface: per user, an open session lives in GroupState,
    * a >`gap` quiet period closes it, and an EVENT-TIME TIMEOUT closes idle
    * sessions once the watermark passes (state is freed without waiting for
    * the user's next event — the bounded-state contract session_window gives
    * you for free, rebuilt on the explicit-state API for session shapes
    * session_window can't express).
    *
    * Emission protocol (update-mode): every touched session is emitted each
    * micro-batch with its current size; a session's final row is the one with
    * max n_events, so `groupBy(user_id, session_start).agg(max(n_events))`
    * rolls the emitted log up to exactly the batch sessionization (assumes
    * per-key in-order arrival; late rows within the watermark start a new
    * session rather than corrupting a closed one).
    */
  final case class OpenSession(start_us: Long, last_us: Long, n_events: Long)
  final case class SessionOut(user_id: Long, session_start: Long,
      n_events: Long, closed: Boolean)

  def sessionizeStateful(events: DataFrame, gapMinutes: Int = 30,
      horizon: String = "2 hours"): org.apache.spark.sql.Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    // the event-time watermark tag rides on the TIMESTAMP attribute — it must
    // reach the FlatMapGroupsWithState input un-projected (converting to
    // epoch micros here would strip it and fail analysis)
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    events.withWatermark("ts", horizon)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, SessionOut](
          OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.start_us, s.n_events, closed = true))
          } else {
            val ts = rows.map(r => us(r._2)).toArray.sorted
            val closed = List.newBuilder[SessionOut]
            var s = state.getOption
              .getOrElse(OpenSession(ts.head, ts.head, 0L))
            ts.foreach { u =>
              if (u - s.last_us > gapUs) {
                closed += SessionOut(uid, s.start_us, s.n_events, closed = true)
                s = OpenSession(u, u, 1L)
              } else s = OpenSession(s.start_us, math.max(s.last_us, u),
                s.n_events + 1)
            }
            state.update(s)
            // close the open session once the watermark passes last + gap
            state.setTimeoutTimestamp((s.last_us + gapUs) / 1000L)
            (closed += SessionOut(uid, s.start_us, s.n_events,
              closed = false)).result().iterator
          }
      }
  }
}
