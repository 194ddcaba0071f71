package graft.queries

import graft.QueryDef
import graft.io.Tables
import graft.text.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus analytics & retrieval operators: staged conversion funnel, blocked
  * edit-distance join, exact TF-IDF top-terms, BM25-shaped keyword retrieval,
  * robust statistics (MAD), ordered group-concat, and per-stratum
  * deterministic sampling. All fully oracle-checked; transcendental-free
  * formulations (rational idf instead of log-idf) keep doubles bit-identical
  * across engines — the gate compares floats with `==`.
  */
object AnalyticsQueries {

  val defs: Map[String, QueryDef] = Map(

    // ----- extension: staged conversion funnel — first view, first click
    // AFTER that view, first purchase AFTER that click, per user. Three keyed
    // aggregations + two equi-joins: each stage shuffles (user_id, ts) pairs
    // only, never the event payload; at 100 TB the event scan is pruned to
    // the three types before any exchange.
    "q_funnel" -> QueryDef.sql("""
      WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
            JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
            WHERE e.event_type = 'click' GROUP BY e.user_id),
      p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e
            JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
            WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id
      ORDER BY v.user_id""") { (s, d) =>
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.filter(col("event_type") === "click").as("e")
        .join(v.as("v"), col("e.user_id") === col("v.user_id") && col("e.ts") > col("v.t_view"))
        .groupBy(col("e.user_id").as("user_id")).agg(min("e.ts").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase").as("e")
        .join(c.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") > col("c.t_click"))
        .groupBy(col("e.user_id").as("user_id")).agg(min("e.ts").as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .orderBy("user_id")
    },

    // ----- extension: blocked edit-distance join — Levenshtein over 25-char
    // prefixes, blocked by lang so the quadratic kernel runs per block (the
    // same blocking discipline as the candidate join J2). Integer distance →
    // engine-neutral. Built-in levenshtein on both engines (codegen'd in
    // Spark; no UDF).
    "q_edit_distance" -> QueryDef.sql("""
      WITH t AS (SELECT doc_id, lang, substr(text, 1, 25) AS s FROM documents)
      SELECT a.doc_id AS d1, b.doc_id AS d2, levenshtein(a.s, b.s) AS dist
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE levenshtein(a.s, b.s) <= 11
      ORDER BY d1, d2""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), substring(col("text"), 1, 25).as("s"))
      val a = t.alias("a")
      val b = t.alias("b")
      a.join(b, col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          levenshtein(col("a.s"), col("b.s")).as("dist"))
        .filter(col("dist") <= 11)
        .orderBy("d1", "d2")
    },

    // ----- M5/M7 oracle-checked form: exact TF-IDF top terms per document
    // with RATIONAL idf (tf·N/df — the log is monotone, so top-k by rational
    // idf ranks like log-idf for single-term scores, and the product stays
    // exact integer arithmetic until one final division). The HashingTF+IDF
    // pipeline variant is q_tfidf_features (model-dependent, rows-only).
    "q_tfidf_topterms" -> QueryDef.sql("""
      WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS t
                   FROM documents),
      tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
      df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY t),
      n AS (SELECT COUNT(*) AS n FROM documents),
      sc AS (SELECT doc_id, t AS term, CAST(tf * n AS DOUBLE) / df AS score
             FROM tf JOIN df USING (t) CROSS JOIN n),
      r AS (SELECT doc_id, term, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
            FROM sc)
      SELECT doc_id, term, score, rn FROM r WHERE rn <= 3
      ORDER BY doc_id, rn""") { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val df = tok.groupBy("t").agg(countDistinct("doc_id").as("df"))
      val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
      tf.join(broadcast(df), "t")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("t").as("term"),
          ((col("tf") * col("n")).cast("double") / col("df")).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("doc_id", "rn")
    },

    // ----- extension: BM25-shaped keyword retrieval — Robertson k1/b term
    // saturation and length normalization with RATIONAL idf
    // ((N-df+0.5)/(df+0.5); the standard form takes its log, which is
    // monotone but not bit-replayable across libm implementations). Per-term
    // scores combine in a FIXED expression order, so every double op is
    // IEEE-identical in both engines. The query-term tf columns come from one
    // conditional aggregation — the document never rides the shuffle.
    "q_bm25" -> QueryDef.sql("""
      WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS t
                   FROM documents),
      len AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      avgl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM len),
      ndocs AS (SELECT COUNT(*) AS n FROM documents),
      tfq AS (SELECT doc_id,
                     COUNT(*) FILTER (WHERE t = 'join') AS tf1,
                     COUNT(*) FILTER (WHERE t = 'hash') AS tf2,
                     COUNT(*) FILTER (WHERE t = 'scan') AS tf3
              FROM tok GROUP BY doc_id),
      dfq AS (SELECT COUNT(DISTINCT CASE WHEN t = 'join' THEN doc_id END) AS df1,
                     COUNT(DISTINCT CASE WHEN t = 'hash' THEN doc_id END) AS df2,
                     COUNT(DISTINCT CASE WHEN t = 'scan' THEN doc_id END) AS df3
              FROM tok),
      -- every constant is CAST to DOUBLE before arithmetic: DuckDB decimal
      -- literals would otherwise do exact-decimal math (tf*2.2 in DECIMAL
      -- then a late coercion), landing on a different double than Spark's
      -- all-double path
      sc AS (SELECT f.doc_id,
                    ((CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5)) * ((CAST(tf1 AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (tf1 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl))))
                  + ((CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5)) * ((CAST(tf2 AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (tf2 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl))))
                  + ((CAST(n - df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5)) * ((CAST(tf3 AS DOUBLE) * CAST(2.2 AS DOUBLE)) / (tf3 + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl)))) AS score
             FROM tfq f JOIN len USING (doc_id) CROSS JOIN avgl CROSS JOIN ndocs CROSS JOIN dfq)
      SELECT doc_id, score FROM sc
      ORDER BY score DESC, doc_id LIMIT 20""") { (s, d) =>
      val terms = Seq("join", "hash", "scan")
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      val len = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val avgl = len.agg((sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      val ndocs = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val tfq = tok.groupBy("doc_id").agg(
        count(when(col("t") === terms(0), 1)).as("tf1"),
        count(when(col("t") === terms(1), 1)).as("tf2"),
        count(when(col("t") === terms(2), 1)).as("tf3"))
      val dfq = tok.agg(
        countDistinct(when(col("t") === terms(0), col("doc_id"))).as("df1"),
        countDistinct(when(col("t") === terms(1), col("doc_id"))).as("df2"),
        countDistinct(when(col("t") === terms(2), col("doc_id"))).as("df3"))
      def termScore(tf: String, df: String) =
        ((col("n") - col(df) + 0.5) / (col(df) + 0.5)) *
          ((col(tf) * 2.2) / (col(tf) + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl")))))
      tfq.join(len, "doc_id")
        .crossJoin(broadcast(avgl))
        .crossJoin(broadcast(ndocs))
        .crossJoin(broadcast(dfq))
        .select(col("doc_id"),
          (termScore("tf1", "df1") + termScore("tf2", "df2") + termScore("tf3", "df3")).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(20)
    },

    // ----- A7 extension: median absolute deviation — the robust
    // spread statistic (two exact interpolated medians; single rounding on
    // both sides, same discipline as q_quantiles).
    "q_mad" -> QueryDef.sql("""
      WITH m AS (SELECT MEDIAN(value) AS med FROM events)
      SELECT ROUND(MAX(med), 6) AS med,
             ROUND(MEDIAN(ABS(value - med)), 6) AS mad
      FROM events CROSS JOIN m""") { (s, d) =>
      val ev = Tables.events(s, d)
      val m = ev.agg(percentile(col("value"), lit(0.5)).as("med"))
      ev.crossJoin(broadcast(m))
        .agg(round(max(col("med")), 6).as("med"),
          round(percentile(abs(col("value") - col("med")), lit(0.5)), 6).as("mad"))
    },

    // ----- A-family extension: ordered group-concat (string_agg/listagg) —
    // deterministic via full sort of the group's values on both engines.
    "q_string_agg" -> QueryDef.sql("""
      SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types
      FROM events WHERE event_id < 500 GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 500)
        .groupBy("user_id")
        .agg(array_join(array_sort(collect_list("event_type")), ",").as("types"))
        .orderBy("user_id")
    },

    // ----- O5 extension: deterministic k-per-stratum sample — md5 hash-race
    // within each group (the reservoir-sample shape with replayable
    // randomness; complements q_sample_stratified's per-stratum rates).
    "q_sample_pergroup" -> QueryDef.sql("""
      WITH r AS (SELECT doc_id, lang,
                        ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                 FROM documents)
      SELECT doc_id, lang, rn FROM r WHERE rn <= 3 ORDER BY lang, rn""") { (s, d) =>
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("lang", "rn")
    }
  )
}
