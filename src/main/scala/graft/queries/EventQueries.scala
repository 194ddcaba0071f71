package graft.queries

import graft.QueryDef
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators: JSON scalar extraction (SURVEY F20) and the batch
  * equivalents of the streaming windows (SURVEY §2.13 — tumbling/sliding/
  * session). The real `readStream` versions live in graft.streaming and are
  * exercised by tests; these batch twins are the oracle-checkable surface,
  * and both share the same window semantics (epoch-aligned starts, 30-min
  * session gap).
  */
object EventQueries {

  val defs: Map[String, QueryDef] = Map(

    // ----- F20: JSON scalar extraction + aggregate
    "q_json_extract" -> QueryDef.sql("""
      SELECT event_type,
             CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // ----- extension: per-key EWMA — the smoothed-metric readout every
    // training/monitoring pipeline computes over an event stream (loss
    // curves, rate dashboards). adjust=true form over a BOUNDED 32-event
    // frame: ewma_i = Σ_j w_j·x_{i-j} / Σ_j w_j with w_j = (1-α)^j — the
    // bounded frame is deliberate: the closed-form infinite recurrence needs
    // pow(1-α, -i) which overflows for long sequences, while a 32-tap finite
    // window is overflow-free at any sequence length and is what streaming
    // smoothers ship anyway. Both engines build the SAME indexed transform
    // over the frame list (element j × pow(0.75, n-j)) so the float op order
    // matches; results rounded to 6. Shape: one window over user_id — a
    // single hash-partitioned sort, no join, value lists capped at 32 doubles.
    // Since r7 this is the ORACLE-TWIN form; the canonical q_ewma below is
    // the ring-buffer recurrence with the same bit-exact output.
    "q_ewma_array" -> QueryDef.sql("""
      WITH w AS (SELECT event_id, user_id, ts, value,
                        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS arr
                 FROM events)
      SELECT event_id, user_id, value,
             ROUND(
               list_sum(list_transform(range(1, len(arr) + 1),
                 j -> arr[j] * pow(0.75, len(arr) - j))) /
               list_sum(list_transform(range(1, len(arr) + 1),
                 j -> pow(0.75, len(arr) - j))), 6) AS ewma
      FROM w ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-31, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("arr", collect_list("value").over(w))
        .selectExpr("event_id", "user_id", "value",
          """round(
               aggregate(transform(sequence(1, size(arr)),
                 j -> element_at(arr, j) * pow(0.75D, size(arr) - j)),
                 0D, (acc, v) -> acc + v) /
               aggregate(transform(sequence(1, size(arr)),
                 j -> pow(0.75D, size(arr) - j)),
                 0D, (acc, v) -> acc + v), 6) AS ewma""")
        .orderBy("user_id", "event_id")
    },

    // ----- the CANONICAL EWMA (promoted r7; q_ewma_array above is the
    // collect_list-window twin kept for oracle cross-checking): identical
    // 32-tap EWMA computed by an ordered per-key pass (groupByKey +
    // flatMapSortedGroups, the secondary-sort shape) over a 32-slot ring
    // buffer — no collect_list window, no 32-element array column
    // materialized per row, 5× cheaper at the 100× ladder. The per-term
    // float ops replay the array form's indexed fold in the SAME j-order
    // with the same pow calls and a HALF_UP round (Spark round()'s mode),
    // so the output is bit-identical and the SAME DuckDB oracle hash-checks
    // both. At scale this is one shuffle + partition-local sort with O(32)
    // state per key — the shape to prefer when EWMA runs at volume.
    "q_ewma" -> QueryDef.sql("""
      WITH w AS (SELECT event_id, user_id, ts, value,
                        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS arr
                 FROM events)
      SELECT event_id, user_id, value,
             ROUND(
               list_sum(list_transform(range(1, len(arr) + 1),
                 j -> arr[j] * pow(0.75, len(arr) - j))) /
               list_sum(list_transform(range(1, len(arr) + 1),
                 j -> pow(0.75, len(arr) - j))), 6) AS ewma
      FROM w ORDER BY user_id, event_id""") { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .as[(Long, Long, Long, Double)]
        .groupByKey(_._1)
        .flatMapSortedGroups(col("us"), col("event_id")) { (user, it) =>
          val buf = new Array[Double](32)
          var n = 0    // slots filled
          var head = 0 // index of the oldest value
          it.map { case (_, eid, _, v) =>
            if (n < 32) { buf((head + n) % 32) = v; n += 1 }
            else { buf(head) = v; head = (head + 1) % 32 }
            // j runs oldest → newest, weight 0.75^(n-1-j): the oracle's
            // arr[j]·pow(0.75, len-j) fold, replayed term for term
            var num = 0.0; var den = 0.0; var j = 0
            while (j < n) {
              val w = math.pow(0.75, (n - 1 - j).toDouble)
              num += buf((head + j) % 32) * w
              den += w
              j += 1
            }
            val ewma = BigDecimal(num / den)
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
              .toDouble
            (eid, user, v, ewma)
          }
        }
        .toDF("event_id", "user_id", "value", "ewma")
        .orderBy("user_id", "event_id")
    },

    // ----- F20 extension on the Spark 4 VARIANT type: parse the props JSON
    // once into a variant column, then typed variant_get extraction — the
    // shredding-friendly path for semi-structured columns at scale (parse
    // cost paid once per row, extraction stays codegen-typed; contrast
    // q_json_extract's per-access string parse). Oracle = DuckDB JSON ops.
    "q_variant_extract" -> QueryDef.sql("""
      SELECT event_type,
             MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
             MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
             CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
      FROM events GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
        .groupBy("event_type")
        .agg(min("k").as("min_k"), max("k").as("max_k"), sum("k").as("sum_k"))
        .orderBy("event_type")
    },

    // ----- §2.13: tumbling window aggregate via the real window() operator;
    // epoch-second starts keep the oracle timestamp-type-agnostic
    "q_window_tumbling" -> QueryDef.sql("""
      SELECT CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""") { (s, d) =>
      graft.streaming.Streaming.tumblingAgg(Tables.events(s, d))
        .orderBy("window_start", "event_type")
    },

    // ----- §2.13 STREAMING: the same tumbling aggregation executed through
    // readStream → memory sink (AvailableNow); one logical plan shared with
    // the batch twin, so the same oracle applies
    "q_stream_tumbling" -> QueryDef.sql("""
      SELECT CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.tumblingAgg(Streaming.eventStream(s, d)),
          s"stream_tumbling_${System.nanoTime()}")
        .orderBy("window_start", "event_type")
    }.serial,

    // ----- §2.13: sliding window (1 h window, 30 min slide) — each event lands
    // in exactly two windows; oracle mirrors via unnest of the two starts
    "q_window_sliding" -> QueryDef.sql("""
      SELECT window_start, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM (SELECT unnest([b - 1800, b]) AS window_start, value
            FROM (SELECT CAST(FLOOR(epoch(ts)/1800)*1800 AS BIGINT) AS b, value
                  FROM events))
      GROUP BY window_start ORDER BY window_start""") { (s, d) =>
      graft.streaming.Streaming.slidingAgg(Tables.events(s, d))
        .orderBy("window_start")
    },

    // ----- §2.13 STREAMING: the sliding aggregation through readStream →
    // memory sink; same logical plan as the batch twin, same oracle
    "q_stream_sliding" -> QueryDef.sql("""
      SELECT window_start, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM (SELECT unnest([b - 1800, b]) AS window_start, value
            FROM (SELECT CAST(FLOOR(epoch(ts)/1800)*1800 AS BIGINT) AS b, value
                  FROM events))
      GROUP BY window_start ORDER BY window_start""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.slidingAgg(Streaming.eventStream(s, d)),
          s"stream_sliding_${System.nanoTime()}")
        .orderBy("window_start")
    }.serial,

    // ----- §2.13 STREAMING: session windows (30-min gap) per user via
    // session_window() through readStream; per-user rollup matches the
    // lag()-based batch oracle
    // ----- extension: AS-OF JOIN — attach each event's most recent prior
    // purchase (same user, right.ts <= left.ts). Spark-side is the tagged
    // union + running last() composition (one shuffle, no range explode);
    // oracle is DuckDB's native ASOF LEFT JOIN
    "q_asof_join" -> QueryDef.sql("""
      SELECT l.event_id, l.user_id,
             r.value AS asof_value,
             epoch_us(r.ts) AS asof_ts_us
      FROM events l ASOF LEFT JOIN
           (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND r.ts <= l.ts
      ORDER BY l.event_id""") { (s, d) =>
      import graft.operators.AsOfJoin
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("ts_us"))
      AsOfJoin.leftAsOf(
          ev.select("event_id", "user_id", "ts"), purchases,
          keyCol = "user_id", tsCol = "ts", payloadCols = Seq("value", "ts_us"))
        .select(col("event_id"), col("user_id"),
          col("asof_value"), col("asof_ts_us"))
        .orderBy("event_id")
    },

    // ----- extension: FORWARD AS-OF JOIN — attach each event's NEXT purchase
    // (same user, right.ts >= left.ts, earliest wins). Same one-shuffle
    // tagged-union plan with the timestamp sort reversed; oracle is DuckDB's
    // ASOF LEFT JOIN with the inequality flipped.
    "q_asof_forward" -> QueryDef.sql("""
      SELECT l.event_id, l.user_id,
             r.value AS next_value,
             epoch_us(r.ts) AS next_ts_us
      FROM events l ASOF LEFT JOIN
           (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND r.ts >= l.ts
      ORDER BY l.event_id""") { (s, d) =>
      import graft.operators.AsOfJoin
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("ts_us"))
      AsOfJoin.leftAsOf(
          ev.select("event_id", "user_id", "ts"), purchases,
          keyCol = "user_id", tsCol = "ts", payloadCols = Seq("value", "ts_us"),
          forward = true)
        .select(col("event_id"), col("user_id"),
          col("asof_value").as("next_value"), col("asof_ts_us").as("next_ts_us"))
        .orderBy("event_id")
    },

    // ----- extension: RANGE JOIN — clicks landing inside each purchase's
    // one-hour window, NO equi key (pure point-in-interval). Spark's native
    // plan would be BroadcastNestedLoopJoin; RangeJoin bins time and hash
    // equi-joins on the bin (see operators.RangeJoin). Oracle is the naive
    // non-equi join in DuckDB.
    "q_range_join" -> QueryDef.sql("""
      WITH w AS (SELECT event_id AS win_id, ts AS start_ts,
                        ts + INTERVAL 1 HOUR AS end_ts
                 FROM events WHERE event_type = 'purchase'),
           p AS (SELECT ts, value FROM events WHERE event_type = 'click')
      SELECT w.win_id, COUNT(*) AS n_clicks,
             CAST(SUM(CAST(p.value AS DECIMAL(30,2))) AS DOUBLE) AS click_value
      FROM p JOIN w ON p.ts >= w.start_ts AND p.ts < w.end_ts
      GROUP BY w.win_id ORDER BY w.win_id""") { (s, d) =>
      import graft.operators.RangeJoin
      val ev = Tables.events(s, d)
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("win_id"), col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("end_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("ts"), col("value"))
      RangeJoin.pointInInterval(clicks, windows, "ts", "start_ts", "end_ts")
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("value").cast("decimal(30,2)")).cast("double")
            .as("click_value"))
        .orderBy("win_id")
    },

    // ----- KEYED range join — the production form at scale: the entity key
    // joins the (key, bin) shuffle key, so candidates are per-user instead of
    // per-bin and a hot time bin no longer concentrates on one task (the
    // unkeyed q_range_join is pair-dense by construction — its OUTPUT grows
    // quadratically with co-temporal intervals; keyed, candidate growth is
    // linear like q_asof_join). Same window shape as q_range_join but only
    // the user's OWN clicks land in their purchase windows.
    "q_range_join_keyed" -> QueryDef.sql("""
      WITH w AS (SELECT user_id, event_id AS win_id, ts AS start_ts,
                        ts + INTERVAL 1 HOUR AS end_ts
                 FROM events WHERE event_type = 'purchase'),
           p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
      SELECT w.win_id, COUNT(*) AS n_clicks,
             CAST(SUM(CAST(p.value AS DECIMAL(30,2))) AS DOUBLE) AS click_value
      FROM p JOIN w ON p.user_id = w.user_id
                   AND p.ts >= w.start_ts AND p.ts < w.end_ts
      GROUP BY w.win_id ORDER BY w.win_id""") { (s, d) =>
      import graft.operators.RangeJoin
      val ev = Tables.events(s, d)
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("win_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("end_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      RangeJoin.pointInInterval(clicks, windows, "ts", "start_ts", "end_ts",
          keys = Seq("user_id"))
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_clicks"),
          sum(col("value").cast("decimal(30,2)")).cast("double")
            .as("click_value"))
        .orderBy("win_id")
    },

    // ----- extension: RANGE-frame window — per-user moving 1-hour sum/count
    // over event time (frame = value range, not row count; the two differ
    // whenever timestamps are irregular). Seconds-typed ordering keeps the
    // frame bounds integer-exact on both engines.
    "q_window_range" -> QueryDef.sql("""
      SELECT event_id,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sum_1h,
             COUNT(*) OVER w AS n_1h
      FROM (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
                   value FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("sec"), col("value"))
        .select(col("event_id"),
          sum(col("value").cast("decimal(30,2)")).over(w).cast("double").as("sum_1h"),
          count(lit(1)).over(w).as("n_1h"))
        .orderBy("event_id")
    },

    // ----- extension: ranking-function family — ntile / percent_rank /
    // cume_dist over per-user event values (deterministic: value then
    // event_id ordering)
    "q_window_rank_fns" -> QueryDef.sql("""
      SELECT event_id,
             CAST(NTILE(4) OVER w AS INT) AS quartile,
             ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
             ROUND(CUME_DIST() OVER w, 9) AS cume
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      ORDER BY event_id""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("value", "event_id")
      Tables.events(s, d)
        .select(col("event_id"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          round(cume_dist().over(w), 9).as("cume"))
        .orderBy("event_id")
    },

    // ----- extension: GROUPING SETS, authored through spark.sql() — the
    // engine's SQL entry point is registry surface too (every other query
    // uses the DataFrame API); grouping_id() disambiguates the NULL levels
    "q_grouping_sets" -> QueryDef.sql("""
      SELECT COALESCE(event_type, '(all)') AS event_type,
             COALESCE(CAST(user_id % 10 AS VARCHAR), '(all)') AS user_mod,
             COUNT(*) AS n
      FROM events
      GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
      ORDER BY event_type, user_mod""") { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("events_gs")
      s.sql("""
        SELECT COALESCE(event_type, '(all)') AS event_type,
               COALESCE(CAST(user_id % 10 AS STRING), '(all)') AS user_mod,
               COUNT(*) AS n
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY event_type, user_mod""")
    },

    // ----- extension: bounded-heap per-key top-k (functions.Aggregators.TopK)
    // — the scale form of row_number()<=k: the buffer never exceeds k rows,
    // partial-aggregates map-side, and ships one k-row buffer per partition
    // per key instead of sorting whole groups. Oracle: the window form.
    "q_topk_agg" -> QueryDef.sql("""
      SELECT event_type, rank, event_id FROM (
        SELECT event_type, event_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY value DESC, event_id ASC) AS BIGINT) - 1 AS rank
        FROM events)
      WHERE rank < 5 ORDER BY event_type, rank""") { (s, d) =>
      import graft.functions.Aggregators
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(Aggregators.topK(5)(col("value"), col("event_id")).as("ids"))
        .select(col("event_type"), posexplode(col("ids")).as(Seq("rank", "event_id")))
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("event_type", "rank")
    },

    // ----- extension: INTERVAL-OVERLAP JOIN — purchase 1 h windows vs error
    // 30 min windows; binned equi-join with the coordination-bin rule (pair
    // kept only in bin(max(starts))) so no dedup shuffle. Oracle: naive
    // overlap theta-join.
    "q_interval_overlap" -> QueryDef.sql("""
      WITH p AS (SELECT event_id AS p_id, ts AS ps, ts + INTERVAL 1 HOUR AS pe
                 FROM events WHERE event_type = 'purchase'),
           e AS (SELECT event_id AS e_id, ts AS es, ts + INTERVAL 30 MINUTE AS ee
                 FROM events WHERE event_type = 'error')
      SELECT p_id, COUNT(*) AS n_overlaps
      FROM p JOIN e ON ps < ee AND es < pe
      GROUP BY p_id ORDER BY p_id""") { (s, d) =>
      import graft.operators.RangeJoin
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("ps"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("pe"))
      val e = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("ts").as("es"),
          (col("ts") + expr("INTERVAL 30 MINUTE")).as("ee"))
      RangeJoin.intervalOverlap(p, e, "ps", "pe", "es", "ee")
        .groupBy("p_id")
        .agg(count(lit(1)).as("n_overlaps"))
        .orderBy("p_id")
    },

    // ----- §2.13 STREAMING: custom per-key state via mapGroupsWithState —
    // integer-exact running (count, max event time) per user; the memory sink
    // holds one row per user per micro-batch, rolled up with max()
    // ----- §2.13: stream-stream time-bounded inner join (click → purchase
    // within 30 min, same user) — both sides watermarked, state evicted by
    // the time-range condition. Same definition runs as a batch self-join;
    // the oracle replays it in SQL.
    "q_stream_join" -> QueryDef.sql("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events)
      SELECT c.user_id, c.us AS first_us, p.us AS then_us
      FROM e c JOIN e p ON c.user_id = p.user_id
      WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        AND p.us >= c.us AND p.us - c.us <= 1800000000
      ORDER BY c.user_id, first_us, then_us""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.followWithin(Streaming.eventStream(s, d), "click", "purchase"),
          s"stream_join_${System.nanoTime()}", mode = "append")
        .orderBy("user_id", "first_us", "then_us")
    }.serial,

    // ----- §2.13: LEFT OUTER stream-stream join — unmatched clicks surface
    // null-padded once the watermark proves no in-window purchase can still
    // arrive. A click younger than (horizon + within) at stream end is
    // UNDECIDABLE on a finite replay (the final watermark stops `horizon`
    // behind max event time), so both engines restrict the click side to the
    // decidable region; inside it, streaming equals the batch left join.
    "q_stream_join_outer" -> QueryDef.sql("""
      WITH m AS (SELECT MAX(epoch_us(ts)) - 9601000000 AS cutoff FROM events),
           c AS (SELECT user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'click'
                   AND epoch_us(ts) <= (SELECT cutoff FROM m)),
           p AS (SELECT user_id, epoch_us(ts) AS us FROM events
                 WHERE event_type = 'purchase')
      SELECT c.user_id, c.us AS first_us, p.us AS then_us
      FROM c LEFT JOIN p ON c.user_id = p.user_id
        AND p.us >= c.us AND p.us - c.us <= 1800000000
      ORDER BY c.user_id, first_us, then_us""") { (s, d) =>
      import graft.streaming.Streaming
      // decidability cutoff = max − (2 h horizon + 30 min window + 10 min boundary slop);
      // driver-side scalar from the static table, a literal in the stream plan
      val maxUs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      val cutoff = maxUs - 9601000000L
      val stream = Streaming.eventStream(s, d)
        .filter(col("event_type") =!= "click" ||
          unix_micros(col("ts")) <= cutoff)
      Streaming.replayToTable(
          Streaming.followWithinOuter(stream, "click", "purchase"),
          s"stream_join_outer_${System.nanoTime()}", mode = "append")
        .orderBy("user_id", "first_us", "then_us")
    }.serial,

    // ----- §2.13 STREAMING: stream-static join — the event stream enriched
    // against the static customer dimension (broadcast, stateless) before a
    // complete-mode per-segment aggregation. Oracle is the plain batch
    // join+group; events.user_id ⊂ customer.c_custkey by testdata design.
    "q_stream_static_join" -> QueryDef.sql("""
      SELECT c.c_mktsegment AS segment, COUNT(*) AS n,
             CAST(SUM(CAST(e.value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1 ORDER BY segment""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.streamStaticAgg(
            Streaming.eventStream(s, d), Tables.customer(s, d)),
          s"stream_static_${System.nanoTime()}")
        .orderBy("segment")
    }.serial,

    // ----- §2.13 STREAMING: sketch maintenance on a stream — the Count-Min
    // frequency sketch (functions.CountMin) maintained INCREMENTALLY as
    // complete-mode streaming-aggregation state (the 64 KB buffer IS the
    // state row; each micro-batch folds in via the Aggregator's elementwise
    // merge, so the streamed sketch equals the batch sketch EXACTLY). The
    // final sketch is probed the same way as q_cms_topk: top-20 exact users
    // with the certified over/band flags, oracle = exact counts + TRUEs.
    // The 100 TB shape: a standing frequency sketch that ingest updates
    // per micro-batch without ever re-scanning the corpus.
    "q_stream_cms" -> QueryDef.sql("""
      SELECT user_id, n_exact, TRUE AS over_ok, TRUE AS band_ok,
             TRUE AS stream_exact FROM (
        SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY user_id
        ORDER BY n_exact DESC, user_id LIMIT 20)
      ORDER BY user_id""") { (s, d) =>
      import graft.functions.CountMin
      import graft.streaming.Streaming
      val sk = Streaming.replayToTable(
        Streaming.eventStream(s, d)
          .agg(CountMin.countMin()(col("user_id")).as("sk"),
            count(lit(1)).as("n_total")),
        s"stream_cms_${System.nanoTime()}")
      val skBatch = Tables.events(s, d)
        .agg(CountMin.countMin()(col("user_id")).as("sk_batch"))
      val est = CountMin.estimate(col("sk"), col("user_id"))
      Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(20)
        .crossJoin(broadcast(sk))
        .crossJoin(broadcast(skBatch))
        .select(col("user_id"), col("n_exact"),
          (est >= col("n_exact")).as("over_ok"),
          // 2× band like q_cms_topk: gate-robust across fixture regens,
          // the tight 1× band stays in CountMinSpec
          (est <= col("n_exact") +
            lit(2L) * CountMin.errorBound(col("n_total")))
            .as("band_ok"),
          (col("sk") === col("sk_batch")).as("stream_exact"))
        .orderBy("user_id")
    }.serial,

    // ----- §2.13 STREAMING: KMV sketch maintained as streaming-aggregation
    // state — the distinct-count / sample sibling of q_stream_cms. The
    // bounded sorted-merge buffer (functions.Kmv.Sketch) folds each
    // micro-batch in losslessly, so streamed ≡ batch EXACTLY (asserted via
    // stream_exact), and because the KMV hash is SQL-replayable the oracle
    // recomputes the per-type distinct ESTIMATE itself — the streamed
    // sketch's estimate hash-matches, not just its error band.
    "q_stream_kmv" -> QueryDef.sql("""
      SELECT event_type, n_exact, est, TRUE AS stream_exact
      FROM (
        SELECT event_type, MAX(nd) AS n_exact,
               CASE WHEN MAX(nd) < 64 THEN CAST(MAX(nd) AS DOUBLE)
                    ELSE ROUND(63.0 * 2147483647 /
                               MAX(CASE WHEN rn = 64 THEN h END), 4) END AS est
        FROM (
          SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS nd
          FROM (SELECT DISTINCT event_type,
                       (1103515245 * (user_id % 2147483647) + 12345)
                         % 2147483647 AS h
                FROM events) hs) r
        GROUP BY event_type) e
      ORDER BY event_type""") { (s, d) =>
      import graft.functions.Kmv
      import graft.streaming.Streaming
      val k = 64
      val sk = Streaming.replayToTable(
        Streaming.eventStream(s, d).groupBy("event_type")
          .agg(Kmv.kmv(k)(col("user_id")).as("sk")),
        s"stream_kmv_${System.nanoTime()}")
      val batch = Tables.events(s, d).groupBy("event_type")
        .agg(Kmv.kmv(k)(col("user_id")).as("sk_batch"),
          countDistinct(col("user_id")).as("n_exact"))
      sk.join(batch, "event_type")
        .select(col("event_type"), col("n_exact"),
          Kmv.estimate(col("sk"), k).as("est"),
          (col("sk") === col("sk_batch")).as("stream_exact"))
        .orderBy("event_type")
    }.serial,

    // ----- §2.13 STREAMING: UNION of two independent streaming sources (the
    // click feed and the error feed read as separate readStreams) merged into
    // one complete-mode aggregation. Oracle: UNION ALL of the same slices.
    "q_stream_union" -> QueryDef.sql("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM (SELECT event_type, value FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT event_type, value FROM events WHERE event_type = 'error')
      GROUP BY event_type ORDER BY event_type""") { (s, d) =>
      import graft.streaming.Streaming
      val clicks = Streaming.eventStream(s, d).filter(col("event_type") === "click")
      val errors = Streaming.eventStream(s, d).filter(col("event_type") === "error")
      Streaming.replayToTable(
          Streaming.unionStreamsAgg(clicks, errors),
          s"stream_union_${System.nanoTime()}")
        .orderBy("event_type")
    }.serial,

    // ----- §2.13 STREAMING: CHAINED stateful aggregations — 30-min per-user
    // tumbling counts re-windowed into 1-h rollups, two stateful operators in
    // one query (append mode). A finite replay can only emit windows the
    // final watermark (max − 2 h) has sealed, so both engines restrict to
    // window_end ≤ max − (2 h + 30 min inner-window delay + 1 s slop).
    "q_stream_chained_agg" -> QueryDef.sql("""
      WITH m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events),
      f AS (SELECT CAST(FLOOR(epoch(ts)/1800)*1800 AS BIGINT) AS w30, user_id,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2),
      g AS (SELECT CAST(FLOOR(w30/3600)*3600 AS BIGINT) AS window_start,
                   COUNT(*) AS n_user_slots,
                   CAST(SUM(n) AS BIGINT) AS n_events,
                   MAX(n) AS max_user_n
            FROM f GROUP BY 1)
      SELECT window_start, n_user_slots, n_events, max_user_n
      FROM g
      WHERE (window_start + 3600) * 1000000 <= (SELECT mx - 9001000000 FROM m)
      ORDER BY window_start""") { (s, d) =>
      import graft.streaming.Streaming
      val maxUs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      Streaming.replayToTable(
          Streaming.chainedWindowAgg(Streaming.eventStream(s, d)),
          s"stream_chained_${System.nanoTime()}", mode = "append")
        .filter((col("window_start") + 3600L) * 1000000L <= maxUs - 9001000000L)
        .orderBy("window_start")
    }.serial,

    // ----- §2.13 × dedup: streaming exact dedup — dropDuplicates keeps the
    // first sighting of each key across micro-batches; the emitted KEY SET
    // equals batch DISTINCT regardless of batch order, which is what the
    // oracle checks. Bounded-state (watermarked) variant spec'd in
    // StreamingSpec (eviction behavior is by design not batch-equivalent).
    "q_stream_dedup" -> QueryDef.sql("""
      SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.dedupKeys(Streaming.eventStream(s, d)),
          s"stream_dedup_${System.nanoTime()}", mode = "append")
        .orderBy("user_id", "event_type")
    }.serial,

    "q_stream_stateful" -> QueryDef.sql("""
      SELECT user_id, COUNT(*) AS n_events, MAX(epoch_us(ts)) AS last_us
      FROM events GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.runningUserState(Streaming.eventStream(s, d)).toDF(),
          s"stream_stateful_${System.nanoTime()}", mode = "update")
        .groupBy("user_id")
        .agg(max("n_events").as("n_events"), max("last_us").as("last_us"))
        .orderBy("user_id")
    }.serial,

    // ----- §2.13 STREAMING: the same running per-user state on
    // transformWithState (Spark 4 arbitrary-state API, RocksDB store) —
    // same rollup, same oracle as q_stream_stateful
    "q_stream_stateful_tws" -> QueryDef.sql("""
      SELECT user_id, COUNT(*) AS n_events, MAX(epoch_us(ts)) AS last_us
      FROM events GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.withRocksDb(s) {
        Streaming.replayToTable(
            Streaming.runningUserStateTws(Streaming.eventStream(s, d)).toDF(),
            s"stream_stateful_tws_${System.nanoTime()}", mode = "update")
          .groupBy("user_id")
          .agg(max("n_events").as("n_events"), max("last_us").as("last_us"))
          .orderBy("user_id")
      }
    }.serial,

    // ----- §2.13 extension: per-user event-type histogram on
    // transformWithState + typed MapState — keyed sub-state (one map entry
    // per type under each user key, updated without rewriting the whole
    // value). Completes the arbitrary-state type coverage alongside the
    // ValueState and timer variants; same update-mode rollup protocol.
    "q_stream_type_hist" -> QueryDef.sql("""
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.withRocksDb(s) {
        Streaming.replayToTable(
            Streaming.typeHistogramTws(Streaming.eventStream(s, d)).toDF(),
            s"stream_type_hist_${System.nanoTime()}", mode = "update")
          .groupBy("user_id", "event_type")
          .agg(max("n").as("n"))
          .orderBy("user_id", "event_type")
      }
    }.serial,

    // ----- §2.13 extension: per-user trailing event-type window on
    // transformWithState + typed ListState (append, trim to last-3) — the
    // ordered-sub-state primitive. Update-mode log rolled up by max_by on
    // the strictly-increasing per-user event count.
    "q_stream_recent_types" -> QueryDef.sql("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
      r AS (SELECT user_id, event_type, us, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn,
                   COUNT(*) OVER (PARTITION BY user_id) AS n_events
            FROM e)
      SELECT user_id, n_events,
             string_agg(event_type, ',' ORDER BY us, event_id) AS recent
      FROM r WHERE rn <= 3 GROUP BY user_id, n_events ORDER BY user_id""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.withRocksDb(s) {
        Streaming.replayToTable(
            Streaming.recentTypesTws(Streaming.eventStream(s, d)).toDF(),
            s"stream_recent_types_${System.nanoTime()}", mode = "update")
          .groupBy("user_id")
          .agg(max("n_events").as("n_events"),
            max_by(col("recent"), col("n_events")).as("recent"))
          .orderBy("user_id")
      }
    }.serial,

    // ----- §2.13 extension: sessionization on transformWithState with
    // EVENT-TIME TIMERS — the explicit-timer form of the gap-close (register
    // at last+gap, supersede on activity, close+free state on expiry). Same
    // update-mode emission protocol and the SAME microsecond-exact oracle as
    // the flatMapGroupsWithState variant; the hash match pins the two state
    // APIs to identical semantics.
    "q_stream_sessions_tws" -> QueryDef.sql("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      g AS (SELECT user_id, us,
              CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                        OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                           > 1800000000
                   THEN 1 ELSE 0 END AS new_s
            FROM e),
      s AS (SELECT user_id, us,
              SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
      SELECT user_id, MIN(us) AS session_start, COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.withRocksDb(s) {
        Streaming.replayToTable(
            Streaming.sessionizeTws(Streaming.eventStream(s, d)).toDF(),
            s"stream_sessions_tws_${System.nanoTime()}", mode = "update")
          .groupBy("user_id", "session_start")
          .agg(max("n_events").as("n_events"))
          .orderBy("user_id", "session_start")
      }
    }.serial,

    // Oracle is microsecond-exact: Spark's session_window end is EXCLUSIVE, so
    // a gap of exactly 30 min starts a new session (diff >= 1800e6 us) — and
    // the testdata does contain near-boundary gaps, so no second-truncation.
    "q_stream_sessions" -> QueryDef.sql("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      g AS (SELECT user_id,
                   CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                             >= 1800000000 OR LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                             IS NULL THEN 1 ELSE 0 END AS new_session
            FROM e)
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM g GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.sessionAgg(Streaming.eventStream(s, d)),
          s"stream_sessions_${System.nanoTime()}")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
        .orderBy("user_id")
    }.serial,

    // ----- §2.13 STREAMING: sessionization rebuilt on flatMapGroupsWithState
    // (explicit GroupState + event-time timeout) instead of session_window();
    // the emitted update-mode log rolls up to the batch sessions (max
    // n_events per (user, session_start) — see Streaming.sessionizeStateful)
    "q_stream_sessions_custom" -> QueryDef.sql("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      g AS (SELECT user_id, us,
              CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                        OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                           > 1800000000
                   THEN 1 ELSE 0 END AS new_s
            FROM e),
      s AS (SELECT user_id, us,
              SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
      SELECT user_id, MIN(us) AS session_start, COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""") { (s, d) =>
      import graft.streaming.Streaming
      Streaming.replayToTable(
          Streaming.sessionizeStateful(Streaming.eventStream(s, d)).toDF(),
          s"stream_sessions_custom_${System.nanoTime()}", mode = "update")
        .groupBy("user_id", "session_start")
        .agg(max("n_events").as("n_events"))
        .orderBy("user_id", "session_start")
    }.serial,

    // ----- §2.13: sessionization (30-min inactivity gap) as window functions;
    // the streaming twin uses session_window()/flatMapGroupsWithState
    "q_sessionize" -> QueryDef.sql("""
      WITH e AS (SELECT user_id, event_id,
                        CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
                 FROM events),
      g AS (SELECT user_id,
                   CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                             > 1800 OR LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                             IS NULL THEN 1 ELSE 0 END AS new_session
            FROM e)
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM g GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("new_session",
          when(col("sec") - lag("sec", 1).over(w) > 1800 ||
               lag("sec", 1).over(w).isNull, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // ----- extension: time-series resample + gap fill (operators.Resample) —
    // hourly per-user grid densified between each user's first and last
    // activity, zero-count gap rows emitted, exact-decimal hourly totals
    // forward-filled across gaps. Users < 30 bound the spine at gate scale;
    // the spine is O(keys × buckets) regardless of event volume (see
    // Resample's scale note). Oracle: generate_series spine + LAST_VALUE
    // IGNORE NULLS window.
    "q_gap_fill" -> QueryDef.sql("""
      WITH pb AS (
        SELECT user_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket,
               COUNT(*) AS n, SUM(CAST(value AS DECIMAL(30,2))) AS total
        FROM events WHERE user_id < 30 GROUP BY 1, 2),
      k AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
            FROM pb GROUP BY user_id),
      spine AS (SELECT user_id,
                       UNNEST(generate_series(mn, mx, 3600)) AS bucket
                FROM k),
      j AS (SELECT s.user_id, s.bucket,
                   COALESCE(pb.n, 0) AS n, pb.total
            FROM spine s LEFT JOIN pb
              ON pb.user_id = s.user_id AND pb.bucket = s.bucket)
      SELECT user_id, bucket, CAST(n AS BIGINT) AS n,
             CAST(LAST_VALUE(total IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket) AS DOUBLE) AS filled_total
      FROM j ORDER BY user_id, bucket""") { (s, d) =>
      graft.operators.Resample.gapFill(
          Tables.events(s, d).filter(col("user_id") < 30),
          "user_id", unix_timestamp(col("ts")), col("value"), 3600L)
        .orderBy("user_id", "bucket")
    },

    // ----- extension: INTERVAL UNION / coverage — each event opens a 5-min
    // activity interval [sec, sec+300); per user, overlapping intervals merge
    // into islands and the query reports island count and total covered
    // seconds (the "how much wall-clock was this key active" measure — ad
    // exposure, sensor uptime, session coverage). The sweep is two per-key
    // window passes (running max of interval end detects island starts, a
    // running sum numbers them) + one aggregation: integer seconds end to
    // end, work O(events per key), never an interval self-join.
    "q_interval_union" -> QueryDef.sql("""
      WITH iv AS (SELECT user_id, event_id,
                         CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
                         CAST(FLOOR(epoch(ts)) + 300 AS BIGINT) AS e
                  FROM events),
      m AS (SELECT user_id, event_id, s, e,
                   MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
            FROM iv),
      g AS (SELECT user_id, s, e,
                   CAST(SUM(CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY s, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
            FROM m),
      isl AS (SELECT user_id, island, MIN(s) AS i_start, MAX(e) AS i_end
              FROM g GROUP BY user_id, island)
      SELECT user_id, COUNT(*) AS n_islands,
             CAST(SUM(i_end - i_start) AS BIGINT) AS covered_s
      FROM isl GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      val byKey = Window.partitionBy("user_id").orderBy("s", "event_id")
      val iv = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("s"),
          (unix_timestamp(col("ts")) + 300).as("e"))
      iv
        .withColumn("maxe",
          max("e").over(byKey.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when(col("maxe").isNull || col("s") > col("maxe"), 1L)
            .otherwise(0L))
            .over(byKey.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(min("s").as("i_start"), max("e").as("i_end"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("i_end") - col("i_start")).as("covered_s"))
        .orderBy("user_id")
    },

    // ----- extension: incremental aggregate maintenance — merge a standing
    // partial-aggregate state (70% of the feed, already reduced to
    // per-(user, type) n/total) with a newly arrived raw slice (the other
    // 30%) WITHOUT recomputing the standing side from raw rows: partials are
    // re-reduced by summing counts and exact-decimal totals. The 100 TB
    // nightly-ingest shape — yesterday's aggregate table + today's delta in
    // one shuffle over pre-reduced rows. Oracle: the full recompute, which
    // the merge must equal exactly.
    "q_incremental_agg" -> QueryDef.sql("""
      SELECT user_id, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS total
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type""") { (s, d) =>
      val e = Tables.events(s, d)
      def part(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(30,2)")).as("total"))
      val standing = part(e.filter(col("event_id") % 10 < 7)) // prior state
      val arriving = part(e.filter(col("event_id") % 10 >= 7)) // new delta
      standing.unionByName(arriving)
        .groupBy("user_id", "event_type")
        .agg(sum("n").as("n"), sum("total").cast("double").as("total"))
        .orderBy("user_id", "event_type")
    }
  )
}
