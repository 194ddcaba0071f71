package graft.queries

import graft.QueryDef
import graft.functions.Aggregators
import graft.io.Tables
import graft.multimodal.Multimodal
import graft.similarity.ArrayOps
import org.apache.spark.sql.functions._

/** Typed-Aggregator, canonical-pair-ordering, and multimodal operators
  * (SURVEY A3/A4/A9, F7/F8, + multimodal extension).
  */
object FunctionQueries {

  val defs: Map[String, QueryDef] = Map(

    // ----- A4 (Spark-4 rewrite): element-wise vector sum as a typed
    // Aggregator with map-side partial aggregation; exploded to (label, idx,
    // s) so DuckDB can mirror with a lateral range join
    "q_vector_sum" -> QueryDef.sql("""
      SELECT label, i - 1 AS idx,
             ROUND(SUM(CAST(embedding[i] AS DOUBLE)), 4) AS s
      FROM embeddings, range(1, 65) t(i)
      GROUP BY label, i ORDER BY label, idx""") { (s, d) =>
      Tables.embeddings(s, d)
        .groupBy("label")
        .agg(Aggregators.vectorSum(ArrayOps.asDouble(col("embedding"))).as("vs"))
        .select(col("label"), posexplode(col("vs")).as(Seq("idx", "sval")))
        .select(col("label"), col("idx"), round(col("sval"), 4).as("s"))
        .orderBy("label", "idx")
    },

    // ----- A9/A11: histogram Aggregator with under/over/NaN-flow buckets
    // (Histogrammar Bin shape; buckets 0-19 data, 20 under, 21 over, 22 nan)
    "q_histogram_agg" -> QueryDef.sql("""
      WITH b AS (SELECT l_returnflag,
                        CAST(CASE WHEN isnan(l_quantity) THEN 22
                                  WHEN l_quantity < 0 THEN 20
                                  WHEN l_quantity >= 50 THEN 21
                                  ELSE FLOOR(l_quantity/2.5) END AS BIGINT) AS bucket
                 FROM lineitem),
      f AS (SELECT DISTINCT l_returnflag FROM lineitem),
      g AS (SELECT f.l_returnflag, t.i AS bucket FROM f, range(0, 23) t(i))
      SELECT g.l_returnflag, g.bucket, COALESCE(c.n, 0) AS n
      FROM g LEFT JOIN (SELECT l_returnflag, bucket, COUNT(*) AS n
                        FROM b GROUP BY 1, 2) c
        ON c.l_returnflag = g.l_returnflag AND c.bucket = g.bucket
      ORDER BY g.l_returnflag, g.bucket""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(Aggregators.histogram(20, 0.0, 50.0)(col("l_quantity")).as("h"))
        .select(col("l_returnflag"), posexplode(col("h")).as(Seq("bucket", "n")))
        .select(col("l_returnflag"), col("bucket").cast("long").as("bucket"), col("n"))
        .orderBy("l_returnflag", "bucket")
    },

    // ----- F7/F8: canonical pair ordering by key token (the reference's
    // takeSmaller/LargerPk over pk.split("_") state tokens,
    // stats/AnalysisUtils.scala:126-156) — pure when/otherwise columns
    "q_canonical_pairs" -> QueryDef.sql("""
      WITH t AS (SELECT doc_id, lang, source,
                        source || '_' || CAST(doc_id AS VARCHAR) AS pk
                 FROM documents)
      SELECT CASE WHEN a.source < b.source
                    OR (a.source = b.source AND a.pk <= b.pk)
                  THEN a.pk ELSE b.pk END AS pk_smaller,
             CASE WHEN a.source < b.source
                    OR (a.source = b.source AND a.pk <= b.pk)
                  THEN b.pk ELSE a.pk END AS pk_larger
      FROM t a JOIN t b
        ON a.lang = b.lang AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
      ORDER BY pk_smaller, pk_larger""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          concat_ws("_", col("source"), col("doc_id")).as("pk"))
      val a = t.alias("a")
      val b = t.alias("b")
      val aFirst = col("a.source") < col("b.source") ||
        (col("a.source") === col("b.source") && col("a.pk") <= col("b.pk"))
      a.join(b,
          col("a.lang") === col("b.lang") &&
          col("b.doc_id") > col("a.doc_id") &&
          col("b.doc_id") <= col("a.doc_id") + 5)
        .select(
          when(aFirst, col("a.pk")).otherwise(col("b.pk")).as("pk_smaller"),
          when(aFirst, col("b.pk")).otherwise(col("a.pk")).as("pk_larger"))
        .orderBy("pk_smaller", "pk_larger")
    },

    // ----- multimodal extension: binary payload + batched stub decode via
    // mapPartitions (the Spark-side plumbing is real; the codec is a stub)
    "q_multimodal_features" -> QueryDef.sql("""
      SELECT doc_id AS id, octet_length(encode(text)) AS n_bytes,
             sha256(text) AS sha,
             1 + (ord(substr(text, 1, 1)) & 127) % 64 AS width,
             1 + (ord(substr(text, 2, 1)) & 127) % 64 AS height
      FROM documents ORDER BY id""") { (s, d) =>
      Multimodal.extractFeatures(
          Multimodal.payloadFrom(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .select(col("id"), col("n_bytes"), col("sha"), col("width"), col("height"))
        .orderBy("id")
    },

    // ----- multimodal extension: REAL container metadata through binary
    // columns — deterministic PNG/WAV/MP4 containers are synthesized from
    // doc ids executor-side, round-tripped through the binary payload
    // column, and parsed back by the REAL header walks
    // (Multimodal.headerDims/wavHeader/mp4Header). The oracle recomputes
    // the expected metadata arithmetically: a parser or builder drift on
    // any byte offset breaks the hash.
    "q_media_metadata" -> QueryDef.sql("""
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 1 + doc_id % 1920
               WHEN 1 THEN 8000 + (doc_id % 5) * 8000
               ELSE 600 + doc_id % 1000
             END AS BIGINT) AS meta1,
             CAST(CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 1 + doc_id % 1080
               WHEN 1 THEN 1 + doc_id % 2
               ELSE (600 + doc_id % 1000) * 30
             END AS BIGINT) AS meta2
      FROM documents WHERE doc_id < 90 ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 90)
        .select("doc_id").as[Long]
        .map { id =>
          (id % 3) match {
            case 0 =>
              val bytes = Multimodal.synthPng(
                (1 + id % 1920).toInt, (1 + id % 1080).toInt)
              val (w, h) = Multimodal.headerDims(bytes).get
              (id, "image", w.toLong, h.toLong)
            case 1 =>
              val bytes = Multimodal.synthWav(
                (1 + id % 2).toInt, (8000 + (id % 5) * 8000).toInt, 16, 16)
              val info = Multimodal.wavHeader(bytes).get
              (id, "audio", info.sampleRate.toLong, info.channels.toLong)
            case _ =>
              val bytes = Multimodal.synthMp4(600 + id % 1000, (600 + id % 1000) * 30)
              val info = Multimodal.mp4Header(bytes).get
              (id, "video", info.timescale, info.duration)
          }
        }
        .toDF("doc_id", "kind", "meta1", "meta2")
        .orderBy("doc_id")
    },

    // ----- multimodal REAL DECODE gate: synthesize true containers from a
    // deterministic pixel/sample formula, push them through the FULL decode
    // path — PNG: zlib-deflated IDAT with filter types cycling 0-4 by row,
    // inflated + unfiltered by decodePng; WAV: s16le PCM read back by
    // wavSamples — and emit integer stats of the DECODED values. The oracle
    // recomputes the same stats from the formula arithmetically, so any
    // defect in deflate/inflate framing, filter reconstruction (Sub/Up/
    // Average/Paeth), or PCM byte order shifts a sum and reddens the hash.
    // Only video frame decode remains stubbed (needs a real codec).
    "q_media_decode" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 60),
      img AS (SELECT id, 8 + id % 17 AS w, 5 + id % 11 AS h FROM ids WHERE id % 2 = 0),
      ipx AS (SELECT id, w, h, (x*7 + y*13 + id*3) % 256 AS v
              FROM img CROSS JOIN range(0,25) rx(x) CROSS JOIN range(0,16) ry(y)
              WHERE x < w AND y < h),
      iagg AS (SELECT id AS doc_id, 'image' AS kind, w*h AS n_vals,
                      SUM(v) AS sum_v, MIN(v) AS min_v, MAX(v) AS max_v
               FROM ipx GROUP BY id, w, h),
      aud AS (SELECT id, 64 + id % 50 AS n FROM ids WHERE id % 2 = 1),
      apx AS (SELECT id, n, ((i*31 + id*17) % 4001) - 2000 AS v
              FROM aud CROSS JOIN range(0,114) ri(i) WHERE i < n),
      aagg AS (SELECT id AS doc_id, 'audio' AS kind, n AS n_vals,
                      SUM(v) AS sum_v, MIN(v) AS min_v, MAX(v) AS max_v
               FROM apx GROUP BY id, n)
      SELECT doc_id, kind, CAST(n_vals AS BIGINT) AS n_vals,
             CAST(sum_v AS BIGINT) AS sum_v, CAST(min_v AS BIGINT) AS min_v,
             CAST(max_v AS BIGINT) AS max_v
      FROM (SELECT * FROM iagg UNION ALL SELECT * FROM aagg)
      ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 60)
        .select("doc_id").as[Long]
        .map { id =>
          if (id % 2 == 0) {
            val w = (8 + id % 17).toInt
            val h = (5 + id % 11).toInt
            val px = Array.tabulate(w * h) { k =>
              val x = k % w; val y = k / w
              ((x * 7 + y * 13 + id * 3) % 256).toInt
            }
            val img = Multimodal.decodePng(Multimodal.encodePng(w, h, 1, px))
              .getOrElse(sys.error(s"PNG round-trip failed for doc $id"))
            require(img.width == w && img.height == h && img.channels == 1)
            val v = img.pixels
            (id, "image", v.length.toLong, v.map(_.toLong).sum,
              v.min.toLong, v.max.toLong)
          } else {
            val n = (64 + id % 50).toInt
            val smp = Array.tabulate(n)(i =>
              ((i * 31 + id * 17) % 4001 - 2000).toInt)
            val v = Multimodal.wavSamples(
                Multimodal.synthWavPcm(1, 8000, 16, smp))
              .getOrElse(sys.error(s"WAV round-trip failed for doc $id"))
            (id, "audio", v.length.toLong, v.map(_.toLong).sum,
              v.min.toLong, v.max.toLong)
          }
        }
        .toDF("doc_id", "kind", "n_vals", "sum_v", "min_v", "max_v")
        .orderBy("doc_id")
    },

    // ----- multimodal VIDEO FRAME decode gate: uncompressed AVI (RIFF —
    // the WAV container family) synthesized with 8-bit gray frames from a
    // deterministic pixel formula, walked back through aviHeader (hdrl/avih:
    // frames, width, height) and aviFrames (movi list, raw 00db chunks).
    // Integer stats of the DECODED frame bytes vs the arithmetic oracle: a
    // mis-walked list, off-by-one chunk pad, or dropped frame shifts a sum
    // and reddens the hash. Compressed streams (00dc) are where the one
    // remaining codec stub begins.
    "q_video_frames" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 40),
      dims AS (SELECT id, 4 + id % 6 AS w, 3 + id % 5 AS h, 2 + id % 4 AS nf
               FROM ids),
      px AS (SELECT id, nf, (f*11 + x*5 + y*7 + id*3) % 256 AS v
             FROM dims
             CROSS JOIN range(0,5) rf(f) CROSS JOIN range(0,9) rx(x)
             CROSS JOIN range(0,7) ry(y)
             WHERE f < nf AND x < w AND y < h)
      SELECT id AS doc_id, CAST(nf AS BIGINT) AS n_frames,
             CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM(v) AS BIGINT) AS sum_px,
             CAST(MIN(v) AS BIGINT) AS min_px,
             CAST(MAX(v) AS BIGINT) AS max_px
      FROM px GROUP BY id, nf ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 40)
        .select("doc_id").as[Long]
        .map { id =>
          val w = (4 + id % 6).toInt
          val h = (3 + id % 5).toInt
          val nf = (2 + id % 4).toInt
          val frames = (0 until nf).map { f =>
            Array.tabulate(w * h) { k =>
              val x = k % w; val y = k / w
              ((f * 11 + x * 5 + y * 7 + id * 3) % 256).toByte
            }
          }
          val bytes = Multimodal.synthAvi(w, h, frames)
          val info = Multimodal.aviHeader(bytes)
            .getOrElse(sys.error(s"AVI header walk failed for doc $id"))
          require(info.width == w && info.height == h && info.nFrames == nf)
          val got = Multimodal.aviFrames(bytes)
            .getOrElse(sys.error(s"AVI frame walk failed for doc $id"))
          val vals = got.flatMap(_.map(b => (b & 0xff).toLong))
          (id, nf.toLong, vals.length.toLong, vals.sum, vals.min, vals.max)
        }
        .toDF("doc_id", "n_frames", "n_px", "sum_px", "min_px", "max_px")
        .orderBy("doc_id")
    },

    // ----- extension twin of q_video_frames for GIF: REAL LZW pixel decode
    // (Multimodal.decodeGif — dictionary coder, variable code width,
    // interlace reordering; no codec library) round-tripped through the REAL
    // LZW encoder twin against an arithmetic oracle. Every even doc takes
    // the interlaced path, so the four-pass row schedule is oracle-checked
    // too (a wrong de-interlace permutes rows and flips sum_xy).
    "q_gif_decode" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 40),
      dims AS (SELECT id, 3 + id % 6 AS w, 2 + id % 5 AS h FROM ids),
      px AS (SELECT id, w, h, x, y, (x*5 + y*7 + id*3) % 16 AS v
             FROM dims
             CROSS JOIN range(0,9) rx(x) CROSS JOIN range(0,7) ry(y)
             WHERE x < w AND y < h)
      SELECT id AS doc_id, CAST(MAX(w) AS BIGINT) AS width,
             CAST(MAX(h) AS BIGINT) AS height,
             (id % 2 = 0) AS interlaced,
             CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM(v) AS BIGINT) AS sum_idx,
             CAST(SUM((v * 17) % 256) AS BIGINT) AS sum_red,
             CAST(SUM(v * (x + y * 10)) AS BIGINT) AS sum_xy
      FROM px GROUP BY id ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      val palette = Array.tabulate(16)(i =>
        (((i * 17) % 256) << 16) | (((i * 29) % 256) << 8) | ((i * 43) % 256))
      Tables.documents(s, d).filter(col("doc_id") < 40)
        .select("doc_id").as[Long]
        .map { id =>
          val w = (3 + id % 6).toInt
          val h = (2 + id % 5).toInt
          val idx = Array.tabulate(w * h) { k =>
            val x = k % w; val y = k / w
            ((x * 5 + y * 7 + id * 3) % 16).toByte
          }
          val inter = id % 2 == 0
          val bytes = Multimodal.synthGif(w, h, idx, palette, inter)
          val img = Multimodal.decodeGif(bytes)
            .getOrElse(sys.error(s"GIF decode failed for doc $id"))
          require(img.width == w && img.height == h &&
            img.interlaced == inter, s"GIF dims/interlace wrong for doc $id")
          val vs = img.indices.map(_ & 0xff)
          val sumRed = vs.map(v => (img.palette(v) >> 16) & 0xff).map(_.toLong).sum
          val sumXy = vs.zipWithIndex.map { case (v, k) =>
            v.toLong * (k % w + (k / w) * 10)
          }.sum
          (id, w.toLong, h.toLong, inter, vs.length.toLong,
            vs.map(_.toLong).sum, sumRed, sumXy)
        }
        .toDF("doc_id", "width", "height", "interlaced", "n_px",
          "sum_idx", "sum_red", "sum_xy")
        .orderBy("doc_id")
    }
  )
}
