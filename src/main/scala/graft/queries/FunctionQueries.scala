package graft.queries

import graft.QueryDef
import graft.functions.Aggregators
import graft.io.Tables
import graft.multimodal.{Jpeg, MsVideo1, Multimodal}
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

    // ----- multimodal extension: binary payload + batched feature extract
    // via mapPartitions. This demo keeps a deliberately-minimal header-only
    // extractor to gate the PLUMBING (schema, partitioning, batch shape);
    // the REAL codec family — JPEG/PNG/GIF/WAV/ADPCM — is exercised by
    // q_media_decode, q_jpeg_*, q_gif_decode, q_adpcm_decode below.
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
    // Only motion-compensated video codecs (H.26x/VPx) remain stubbed
    // (frame-differencing inter-frame decode is real: q_msvideo1_frames).
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
    // and reddens the hash. Compressed 00dc streams: MJPEG decodes through
    // Jpeg.aviMjpegFrames (q_mjpeg_frames); motion-compensated codecs
    // remain the stub boundary.
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
    },

    // ----- baseline JPEG PIXEL decode gate (retires the image slice of the
    // entropy-coded stub): DC-only blocks make the whole pipeline exactly
    // integral — with q0 = 8 the IDCT of a DC-only block is dc*q0/8 = dc in
    // every pixel, so decoded value = clamp(dc + 128, 0, 255) with zero
    // float ambiguity. What the gate still exercises for real: marker walk,
    // canonical Huffman DC decode, DC-diff prediction, EOB, restart-marker
    // resync + predictor reset (every id%3==0 doc uses DRI=2), dequant,
    // IDCT, level shift, clamp, multi-block raster placement and edge-block
    // cropping. The position-weighted sum_xy reddens on any misplaced or
    // mis-cropped block; min/max redden on a broken clamp.
    "q_jpeg_decode" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id, 6 + doc_id % 19 AS w, 5 + doc_id % 13 AS h
                   FROM documents WHERE doc_id < 40),
      blocks AS (
        SELECT id, w, h,
               by * ((w + 7) // 8) + bx AS b,
               8*bx AS x0, LEAST(8*bx+8, w) AS x1,
               8*by AS y0, LEAST(8*by+8, h) AS y1
        FROM ids CROSS JOIN range(0,3) rx(bx) CROSS JOIN range(0,3) ry(by)
        WHERE 8*bx < w AND 8*by < h),
      vals AS (
        SELECT id, w, h, x1-x0 AS nx, y1-y0 AS ny, x0, x1, y0, y1,
               LEAST(255, GREATEST(0, ((id*7 + b*13) % 381) - 190 + 128)) AS v
        FROM blocks)
      SELECT id AS doc_id,
             CAST(MAX(w) AS BIGINT) AS width,
             CAST(MAX(h) AS BIGINT) AS height,
             CAST(SUM(nx*ny) AS BIGINT) AS n_px,
             CAST(SUM(v*nx*ny) AS BIGINT) AS sum_px,
             CAST(MIN(v) AS BIGINT) AS min_px,
             CAST(MAX(v) AS BIGINT) AS max_px,
             CAST(SUM(v * (((x0+x1-1)*nx//2) * ny + ((y0+y1-1)*ny//2) * 31 * nx)) AS BIGINT) AS sum_xy
      FROM vals GROUP BY id ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 40)
        .select("doc_id").as[Long]
        .map { id =>
          val w = (6 + id % 19).toInt
          val h = (5 + id % 13).toInt
          val bw = (w + 7) / 8; val bh = (h + 7) / 8
          val quant = Array.fill(64)(16); quant(0) = 8
          val blocks = Array.tabulate(bw * bh) { b =>
            val blk = new Array[Int](64)
            blk(0) = ((id * 7 + b * 13) % 381).toInt - 190
            blk
          }
          val ri = if (id % 3 == 0) 2 else 0
          val bytes = Jpeg.encodeJpegFromCoeffs(w, h, quant, blocks, ri)
          val img = Jpeg.decodeJpeg(bytes)
            .getOrElse(sys.error(s"JPEG decode failed for doc $id"))
          require(img.width == w && img.height == h && img.components == 1)
          val px = img.planes(0)
          val sumXy = px.indices.map { i =>
            px(i).toLong * (i % w + (i / w) * 31)
          }.sum
          (id, w.toLong, h.toLong, px.length.toLong, px.map(_.toLong).sum,
            px.min.toLong, px.max.toLong, sumXy)
        }
        .toDF("doc_id", "width", "height", "n_px", "sum_px", "min_px",
          "max_px", "sum_xy")
        .orderBy("doc_id")
    },

    // ----- JPEG ENTROPY-LAYER gate: the coefficient path is LOSSLESS, so a
    // full-AC encode→decode round trip must reproduce every quantized
    // coefficient bit-for-bit — this gates what the DC-only pixel gate
    // cannot: AC run/size Huffman decode, ZRL (the sparse formula leaves
    // >16-zero gaps), EOB, byte stuffing, and the de-zigzag permutation
    // (the SQL replays zigzag→natural through the engine's own table,
    // embedded as a literal — a wrong decoder table mismatches sum_cpos).
    "q_jpeg_coeffs" -> QueryDef.sql(s"""
      WITH zz AS (SELECT k, zn FROM (SELECT UNNEST(${Jpeg.ZigZag.mkString("[", ",", "]")}) AS zn,
                                            UNNEST(range(0,64)) AS k)),
      ids AS (SELECT doc_id AS id, 6 + doc_id % 19 AS w, 5 + doc_id % 13 AS h
              FROM documents WHERE doc_id < 40),
      dims AS (SELECT id, ((w + 7) // 8) * ((h + 7) // 8) AS nb, w, h FROM ids),
      coefs AS (
        SELECT id, nb, b, k, zn,
               CASE WHEN k = 0 THEN ((id*5 + b*11) % 201) - 100
                    WHEN (k + b*3 + id) % 17 = 0
                      THEN ((id*13 + b*7 + k*19) % 1001) - 500
                    ELSE 0 END AS c
        FROM dims CROSS JOIN range(0,9) rb(b) CROSS JOIN zz
        WHERE b < nb),
      qt AS (SELECT id, k, zn, 1 + (k*3 + id) % 50 AS q
             FROM ids CROSS JOIN zz)
      SELECT c.id AS doc_id,
             CAST(MAX(c.nb) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN c.c <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nz,
             CAST(SUM(c.c) AS BIGINT) AS sum_c,
             CAST(SUM(c.c * c.zn) AS BIGINT) AS sum_cpos,
             CAST(SUM(c.c * c.b) AS BIGINT) AS sum_cb,
             CAST(MAX(q.sq) AS BIGINT) AS sum_q
      FROM coefs c
      JOIN (SELECT id, SUM(q * zn) AS sq FROM qt GROUP BY id) q ON q.id = c.id
      GROUP BY c.id ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 40)
        .select("doc_id").as[Long]
        .map { id =>
          val w = (6 + id % 19).toInt
          val h = (5 + id % 13).toInt
          val nb = ((w + 7) / 8) * ((h + 7) / 8)
          val quant = Array.tabulate(64)(k => 1 + (k * 3 + id).toInt % 50)
          val blocks = Array.tabulate(nb) { b =>
            Array.tabulate(64) { k =>
              if (k == 0) ((id * 5 + b * 11) % 201).toInt - 100
              else if ((k + b * 3 + id) % 17 == 0)
                ((id * 13 + b * 7 + k * 19) % 1001).toInt - 500
              else 0
            }
          }
          val ri = if (id % 4 == 0) 3 else 0
          val bytes = Jpeg.encodeJpegFromCoeffs(w, h, quant, blocks, ri)
          val got = Jpeg.jpegQuantizedCoeffs(bytes)
            .getOrElse(sys.error(s"JPEG coeff decode failed for doc $id"))
          require(got.width == w && got.height == h)
          val c0 = got.comps(0)
          require(c0.blocksWide * c0.blocksHigh == nb)
          // decoder output is NATURAL order: weight by the natural position
          val flat = for (b <- 0 until nb; p <- 0 until 64)
            yield (b, p, c0.blocks(b)(p))
          val sumQ = c0.quant.zipWithIndex.map { case (q, p) => q.toLong * p }.sum
          (id, nb.toLong,
            flat.count(_._3 != 0).toLong,
            flat.map(_._3.toLong).sum,
            flat.map { case (_, p, c) => c.toLong * p }.sum,
            flat.map { case (b, _, c) => c.toLong * b }.sum,
            sumQ)
        }
        .toDF("doc_id", "n_blocks", "n_nz", "sum_c", "sum_cpos", "sum_cb", "sum_q")
        .orderBy("doc_id")
    },

    // ----- MJPEG VIDEO gate: AVI '00dc' chunks each carrying a baseline
    // JPEG (DC-only frames → exact pixel arithmetic, as q_jpeg_decode), so
    // compressed-video frame decode is now gated end to end: RIFF movi walk
    // → per-frame JPEG decode → pixel stats. The frame-weighted sum_f pins
    // frame ORDER (a swapped or dropped frame reddens it).
    "q_mjpeg_frames" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id, 6 + doc_id % 11 AS w, 5 + doc_id % 7 AS h,
                          2 + doc_id % 3 AS nf
                   FROM documents WHERE doc_id < 30),
      blocks AS (
        SELECT id, w, h, nf, f,
               by * ((w + 7) // 8) + bx AS b,
               (LEAST(8*bx+8, w) - 8*bx) * (LEAST(8*by+8, h) - 8*by) AS npx
        FROM ids CROSS JOIN range(0,4) rf(f)
                 CROSS JOIN range(0,2) rx(bx) CROSS JOIN range(0,2) ry(by)
        WHERE f < nf AND 8*bx < w AND 8*by < h),
      vals AS (
        SELECT id, nf, f, npx,
               LEAST(255, GREATEST(0, ((id*3 + f*17 + b*29) % 361) - 180 + 128)) AS v
        FROM blocks)
      SELECT id AS doc_id,
             CAST(MAX(nf) AS BIGINT) AS n_frames,
             CAST(SUM(npx) AS BIGINT) AS n_px,
             CAST(SUM(v*npx) AS BIGINT) AS sum_px,
             CAST(MIN(v) AS BIGINT) AS min_px,
             CAST(MAX(v) AS BIGINT) AS max_px,
             CAST(SUM(v*npx*f) AS BIGINT) AS sum_f
      FROM vals GROUP BY id ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 30)
        .select("doc_id").as[Long]
        .map { id =>
          val w = (6 + id % 11).toInt
          val h = (5 + id % 7).toInt
          val nf = (2 + id % 3).toInt
          val bw = (w + 7) / 8; val bh = (h + 7) / 8
          val quant = Array.fill(64)(16); quant(0) = 8
          val frames = (0 until nf).map { f =>
            val blocks = Array.tabulate(bw * bh) { b =>
              val blk = new Array[Int](64)
              blk(0) = ((id * 3 + f * 17 + b * 29) % 361).toInt - 180
              blk
            }
            Jpeg.encodeJpegFromCoeffs(w, h, quant, blocks)
          }
          val avi = Multimodal.synthAviMjpeg(w, h, frames)
          val imgs = Multimodal.aviMjpegFrames(avi)
            .getOrElse(sys.error(s"MJPEG walk failed for doc $id"))
          require(imgs.length == nf && imgs.forall(i => i.width == w && i.height == h))
          val perPx = imgs.zipWithIndex.flatMap { case (img, f) =>
            img.planes(0).map(v => (v.toLong, f.toLong))
          }
          (id, nf.toLong, perPx.length.toLong, perPx.map(_._1).sum,
            perPx.map(_._1).min, perPx.map(_._1).max,
            perPx.map { case (v, f) => v * f }.sum)
        }
        .toDF("doc_id", "n_frames", "n_px", "sum_px", "min_px", "max_px", "sum_f")
        .orderBy("doc_id")
    },

    // ----- INTER-FRAME video decode gate (r9): MS Video 1 (CRAM), a real
    // documented frame-differencing codec — 4x4 blocks, bottom-up, with
    // SKIP ops that copy from the PREVIOUS frame (graft.multimodal.MsVideo1;
    // narrows the declared video stub to motion-COMPENSATED codecs only).
    // Fixture video: a moving 2-color checker sprite + a moving 8-color
    // quadrant block over a STATIC background, so from frame 1 on the
    // encoder emits real skip runs and the decoder must reconstruct most
    // pixels from frame carry — the oracle computes the TRUE per-frame
    // pixels from the generating formula, so a broken skip copy, wrong
    // bottom-up block order, or bad quadrant indexing shifts sum_pos/f and
    // reddens the hash (MsVideo1Spec pins op-level conventions; this gate
    // pins the whole container->codestream->carry pipeline).
    "q_msvideo1_frames" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id, 3 + doc_id % 3 AS nf
                   FROM documents WHERE doc_id < 40),
      px AS (
        SELECT id, nf, f, x, y,
          CASE
            WHEN x//4 = (id + f) % 4 AND y//4 = (id + 2*f) % 4
              THEN CASE WHEN (x + y) % 2 = 0 THEN (id*5 + f*3) % 32768
                        ELSE ((id*5 + f*3) % 32768 + 7777) % 32768 END
            WHEN x//4 = ((id + f) % 4 + 1) % 4 AND y//4 = (id + 2*f) % 4
              THEN CASE WHEN (x + y) % 2 = 0
                THEN (id*3 + f*5 + ((y%4)//2*2 + (x%4)//2)*11) % 32768
                ELSE ((id*3 + f*5 + ((y%4)//2*2 + (x%4)//2)*11) % 32768 + 4321) % 32768 END
            ELSE (id*3 + (x//4)*5 + (y//4)*7) % 32768
          END AS v
        FROM ids
        CROSS JOIN range(0,5) rf(f)
        CROSS JOIN range(0,16) rx(x) CROSS JOIN range(0,16) ry(y)
        WHERE f < nf)
      SELECT id AS doc_id,
             CAST(MAX(nf) AS BIGINT) AS n_frames,
             CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM(v // 1024) AS BIGINT) AS sum_r,
             CAST(SUM(v // 32 % 32) AS BIGINT) AS sum_g,
             CAST(SUM(v % 32) AS BIGINT) AS sum_b,
             CAST(SUM(v * (x + y*16 + f*256)) AS BIGINT) AS sum_pos
      FROM px GROUP BY id ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 40)
        .select("doc_id").as[Long]
        .map { id =>
          val w = 16; val h = 16
          val nf = (3 + id % 3).toInt
          def pixel(f: Int, x: Int, y: Int): Int = {
            val sx = ((id + f) % 4).toInt; val sy = ((id + 2 * f) % 4).toInt
            val bx = x / 4; val by = y / 4
            if (bx == sx && by == sy) {
              val cA = ((id * 5 + f * 3) % 32768).toInt
              if ((x + y) % 2 == 0) cA else (cA + 7777) % 32768
            } else if (bx == (sx + 1) % 4 && by == sy) {
              val q = (y % 4 / 2) * 2 + (x % 4 / 2)
              val v0 = ((id * 3 + f * 5 + q * 11) % 32768).toInt
              if ((x + y) % 2 == 0) v0 else (v0 + 4321) % 32768
            } else ((id * 3 + bx * 5 + by * 7) % 32768).toInt
          }
          val frames = (0 until nf).map(f =>
            Array.tabulate(w * h)(k => pixel(f, k % w, k / w)))
          val avi = Multimodal.synthAviCompressed(w, h,
            MsVideo1.encodeFrames(w, h, frames))
          val got = MsVideo1.aviCramFrames(avi, w, h)
            .getOrElse(sys.error(s"CRAM walk failed for doc $id"))
          require(got.length == nf, s"frame count mismatch for doc $id")
          var nPx = 0L; var sr = 0L; var sg = 0L; var sb = 0L; var sp = 0L
          got.zipWithIndex.foreach { case (fr, f) =>
            var k = 0
            while (k < fr.length) {
              val v = fr(k); val x = k % w; val y = k / w
              nPx += 1; sr += v >> 10; sg += (v >> 5) & 31; sb += v & 31
              sp += v.toLong * (x + y * 16 + f * 256)
              k += 1
            }
          }
          (id, nf.toLong, nPx, sr, sg, sb, sp)
        }
        .toDF("doc_id", "n_frames", "n_px", "sum_r", "sum_g", "sum_b", "sum_pos")
        .orderBy("doc_id")
    },

    // ----- 4:2:0 CHROMA-SUBSAMPLED JPEG gate (the dominant real-world
    // layout): three components, luma sampled 2x2, MCU-interleaved scan,
    // restart every MCU on id%3==0 docs. DC-only blocks keep every stage
    // exactly integral (q0 = 8), so the oracle replays the FULL pipeline
    // arithmetically: per-pixel luma = clamp(dc of luma block
    // (y/8, x/8) in the 2·mcuW-wide grid), per-pixel chroma = clamp(dc of
    // the chroma block covering (x/2, y/2)) — i.e. the MCU data-unit
    // order, the per-component DC predictor chains, the component grids,
    // AND the replication upsample are all pinned by the position-weighted
    // sums (a swapped data unit, a mcuW-vs-ceil(w/8) grid confusion, or a
    // misaligned upsample shifts sum_xy_* and reddens the hash).
    "q_jpeg420_decode" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id, 10 + doc_id % 23 AS w, 9 + doc_id % 17 AS h,
                          (10 + doc_id % 23 + 15) // 16 AS mcw
                   FROM documents WHERE doc_id < 30),
      px AS (SELECT id, w, h, mcw, x, y,
                    LEAST(255, GREATEST(0,
                      ((id*7 + ((y//8)*(2*mcw) + (x//8))*19) % 381) - 190 + 128)) AS yv,
                    LEAST(255, GREATEST(0,
                      ((id*11 + (((y//2)//8)*mcw + (x//2)//8)*23) % 301) - 150 + 128)) AS cbv,
                    LEAST(255, GREATEST(0,
                      ((id*13 + (((y//2)//8)*mcw + (x//2)//8)*29) % 321) - 160 + 128)) AS crv
             FROM ids CROSS JOIN range(0,32) rx(x) CROSS JOIN range(0,25) ry(y)
             WHERE x < w AND y < h)
      SELECT id AS doc_id,
             CAST(MAX(w) AS BIGINT) AS width,
             CAST(MAX(h) AS BIGINT) AS height,
             CAST(3 * COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM(yv) AS BIGINT) AS sum_y,
             CAST(SUM(cbv) AS BIGINT) AS sum_cb,
             CAST(SUM(crv) AS BIGINT) AS sum_cr,
             CAST(SUM(yv * (x + y*37)) AS BIGINT) AS sum_xy_y,
             CAST(SUM(cbv * (x + y*37)) AS BIGINT) AS sum_xy_cb,
             CAST(LEAST(MIN(yv), MIN(cbv), MIN(crv)) AS BIGINT) AS min_px,
             CAST(GREATEST(MAX(yv), MAX(cbv), MAX(crv)) AS BIGINT) AS max_px
      FROM px GROUP BY id ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 30)
        .select("doc_id").as[Long]
        .map { id =>
          val w = (10 + id % 23).toInt
          val h = (9 + id % 17).toInt
          val mcw = (w + 15) / 16; val mch = (h + 15) / 16
          val quant = Array.fill(64)(16); quant(0) = 8
          def dcBlocks(n: Int, f: Int => Int) = Array.tabulate(n) { b =>
            val blk = new Array[Int](64); blk(0) = f(b); blk
          }
          val bytes = Jpeg.encodeJpegMulti(w, h, Seq(
            Jpeg.EncComp(2, 2, quant, dcBlocks(4 * mcw * mch,
              b => ((id * 7 + b * 19) % 381).toInt - 190)),
            Jpeg.EncComp(1, 1, quant, dcBlocks(mcw * mch,
              b => ((id * 11 + b * 23) % 301).toInt - 150)),
            Jpeg.EncComp(1, 1, quant, dcBlocks(mcw * mch,
              b => ((id * 13 + b * 29) % 321).toInt - 160))),
            restartInterval = if (id % 3 == 0) 1 else 0)
          val img = Jpeg.decodeJpeg(bytes)
            .getOrElse(sys.error(s"4:2:0 decode failed for doc $id"))
          require(img.components == 3 && img.width == w && img.height == h)
          val Vector(yp, cb, cr) = img.planes
          def wsum(p: Array[Int]) =
            p.indices.map(i => p(i).toLong * (i % w + (i / w) * 37)).sum
          (id, w.toLong, h.toLong, 3L * w * h,
            yp.map(_.toLong).sum, cb.map(_.toLong).sum, cr.map(_.toLong).sum,
            wsum(yp), wsum(cb),
            math.min(yp.min, math.min(cb.min, cr.min)).toLong,
            math.max(yp.max, math.max(cb.max, cr.max)).toLong)
        }
        .toDF("doc_id", "width", "height", "n_px", "sum_y", "sum_cb",
          "sum_cr", "sum_xy_y", "sum_xy_cb", "min_px", "max_px")
        .orderBy("doc_id")
    },

    // ----- PROGRESSIVE (SOF2) JPEG gate: the libjpeg-default layout —
    // spectral selection (DC scan, AC bands 1-31 / 32-63) PLUS successive
    // approximation (point transform 1 → 0: first scans carry the high
    // bits, refinement scans place ±1 newly-nonzero values after
    // zero-history runs and append per-position correction bits, with
    // end-of-band runs carried ACROSS blocks and their correction bits
    // buffered after the EOBn code). The entropy layer is still lossless,
    // so a full-AC encode→decode round trip must reproduce every quantized
    // coefficient bit-for-bit — same oracle style as q_jpeg_coeffs, fresh
    // formulas. Any mis-ordered correction bit, wrong zero-history count,
    // dropped EOBn extension bit, or broken DC bit-append shifts a sum.
    "q_jpeg_progressive" -> QueryDef.sql(s"""
      WITH zz AS (SELECT k, zn FROM (SELECT UNNEST(${Jpeg.ZigZag.mkString("[", ",", "]")}) AS zn,
                                            UNNEST(range(0,64)) AS k)),
      ids AS (SELECT doc_id AS id, 5 + doc_id % 21 AS w, 4 + doc_id % 15 AS h
              FROM documents WHERE doc_id < 40),
      dims AS (SELECT id, ((w + 7) // 8) * ((h + 7) // 8) AS nb, w, h FROM ids),
      coefs AS (
        SELECT id, nb, b, k, zn,
               CASE WHEN k = 0 THEN ((id*7 + b*13) % 241) - 120
                    WHEN (k*3 + b*5 + id) % 13 = 0
                      THEN ((id*17 + b*11 + k*23) % 801) - 400
                    ELSE 0 END AS c
        FROM dims CROSS JOIN range(0,12) rb(b) CROSS JOIN zz
        WHERE b < nb)
      SELECT id AS doc_id,
             CAST(MAX(nb) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN c <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nz,
             CAST(SUM(CASE WHEN c % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd,
             CAST(SUM(c) AS BIGINT) AS sum_c,
             CAST(SUM(c * zn) AS BIGINT) AS sum_cpos,
             CAST(SUM(c * b) AS BIGINT) AS sum_cb
      FROM coefs GROUP BY id ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 40)
        .select("doc_id").as[Long]
        .map { id =>
          val w = (5 + id % 21).toInt
          val h = (4 + id % 15).toInt
          val nb = ((w + 7) / 8) * ((h + 7) / 8)
          val quant = Array.tabulate(64)(k => 1 + (k * 7 + id).toInt % 60)
          val blocks = Array.tabulate(nb) { b =>
            Array.tabulate(64) { k =>
              if (k == 0) ((id * 7 + b * 13) % 241).toInt - 120
              else if ((k * 3 + b * 5 + id) % 13 == 0)
                ((id * 17 + b * 11 + k * 23) % 801).toInt - 400
              else 0
            }
          }
          val bytes = Jpeg.encodeJpegProgressive(w, h,
            Seq(Jpeg.EncComp(1, 1, quant, blocks)))
          val got = Jpeg.jpegQuantizedCoeffs(bytes)
            .getOrElse(sys.error(s"progressive decode failed for doc $id"))
          require(got.width == w && got.height == h)
          val c0 = got.comps(0)
          // n_odd pins the LOW bit of every coefficient — exactly the bit
          // the successive-approximation refinement scans deliver
          val flat = for (b <- 0 until nb; p <- 0 until 64)
            yield (b, p, c0.blocks(b)(p))
          (id, nb.toLong,
            flat.count(_._3 != 0).toLong,
            flat.count(t => t._3 % 2 != 0).toLong,
            flat.map(_._3.toLong).sum,
            flat.map { case (_, p, c) => c.toLong * p }.sum,
            flat.map { case (b, _, c) => c.toLong * b }.sum)
        }
        .toDF("doc_id", "n_blocks", "n_nz", "n_odd", "sum_c", "sum_cpos", "sum_cb")
        .orderBy("doc_id")
    },

    // ----- G.711 companded-audio decode gate (ITU-T μ-law / A-law — the
    // telephony WAV formats, tags 7/6): synthesize real RIFF containers
    // whose data bytes follow a deterministic formula, expand them through
    // the FULL wavSamplesG711 path (fmt-tag dispatch + chunk walk +
    // per-byte expansion), and emit integer stats of the DECODED linear
    // samples. The oracle replays the g711.c expansion arithmetic in pure
    // SQL (complement/XOR 0x55, segment shift, bias) — a wrong sign fold,
    // mis-read format tag, or off-by-one segment shift flips a sum.
    // sum_xi pins sample ORDER through the chunk walk.
    "q_g711_decode" -> QueryDef.sql("""
      WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 60),
      aud AS (SELECT id, 48 + id % 40 AS n, id % 2 = 1 AS alaw FROM ids),
      cod AS (SELECT id, n, alaw, i, (i*37 + id*11) % 256 AS c
              FROM aud CROSS JOIN range(0,88) ri(i) WHERE i < n),
      lin AS (
        SELECT id, n, i,
               CASE WHEN alaw THEN
                 CASE WHEN xor(c, 85) >= 128 THEN 1 ELSE -1 END *
                 CASE WHEN (xor(c, 85) // 16) % 8 = 0
                        THEN (xor(c, 85) % 16) * 16 + 8
                      WHEN (xor(c, 85) // 16) % 8 = 1
                        THEN (xor(c, 85) % 16) * 16 + 264
                      ELSE ((xor(c, 85) % 16) * 16 + 264)
                             * (1 << ((xor(c, 85) // 16) % 8 - 1)) END
               ELSE
                 CASE WHEN 255 - c >= 128 THEN -1 ELSE 1 END *
                 ((((255 - c) % 16) * 8 + 132)
                    * (1 << (((255 - c) // 16) % 8)) - 132)
               END AS v
        FROM cod)
      SELECT id AS doc_id, CAST(n AS BIGINT) AS n_vals,
             CAST(SUM(v) AS BIGINT) AS sum_v,
             CAST(MIN(v) AS BIGINT) AS min_v,
             CAST(MAX(v) AS BIGINT) AS max_v,
             CAST(SUM(v * i) AS BIGINT) AS sum_xi
      FROM lin GROUP BY id, n ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 60)
        .select("doc_id").as[Long]
        .map { id =>
          val n = (48 + id % 40).toInt
          val aLaw = id % 2 == 1
          val codes = Array.tabulate(n)(i => ((i * 37 + id * 11) % 256).toInt)
          val v = Multimodal.wavSamplesG711(
              Multimodal.synthWavG711(1, 8000, codes, aLaw))
            .getOrElse(sys.error(s"G.711 decode failed for doc $id"))
          require(v.length == n)
          (id, n.toLong, v.map(_.toLong).sum, v.min.toLong, v.max.toLong,
            v.zipWithIndex.map { case (s0, i) => s0.toLong * i }.sum)
        }
        .toDF("doc_id", "n_vals", "sum_v", "min_v", "max_v", "sum_xi")
        .orderBy("doc_id")
    },

    // ----- IMA ADPCM decode gate (WAV format tag 0x11 — the classic 4-bit
    // differential codec): synthesize real one-block containers whose
    // nibble codes follow a deterministic formula, decode through the FULL
    // wavSamplesAdpcm path (fmt-tag dispatch, block header, low-nibble-
    // first unpacking, the two-register predictor/step-index automaton),
    // and emit integer stats of the DECODED samples. The oracle replays
    // the IMA automaton as a DuckDB RECURSIVE CTE carrying the same
    // (pred, si) state with the published 89-entry step table inlined —
    // a wrong clamp, index adjust, nibble order, or sign fold diverges the
    // recurrence from sample k onward and reddens the hash. sum_xi pins
    // sample ORDER.
    "q_adpcm_decode" -> QueryDef.sql(s"""
      WITH RECURSIVE ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 60),
      cfg AS (SELECT id, 40 + 2*(id % 16) AS n,
                     ((id*29) % 4001) - 2000 AS p0, id % 89 AS s0 FROM ids),
      r AS (
        SELECT id, n, 0 AS i, p0 AS pred, s0 AS si FROM cfg
        UNION ALL
        SELECT id, n, i + 1,
          GREATEST(-32768, LEAST(32767, pred +
            CASE WHEN ((i*7 + id*13) % 16) >= 8 THEN -1 ELSE 1 END *
            ( ${Multimodal.ImaStepTable.mkString("[", ",", "]")}[si + 1] // 8
              + CASE WHEN ((i*7 + id*13) % 16) % 2 = 1
                  THEN ${Multimodal.ImaStepTable.mkString("[", ",", "]")}[si + 1] // 4 ELSE 0 END
              + CASE WHEN (((i*7 + id*13) % 16) // 2) % 2 = 1
                  THEN ${Multimodal.ImaStepTable.mkString("[", ",", "]")}[si + 1] // 2 ELSE 0 END
              + CASE WHEN (((i*7 + id*13) % 16) // 4) % 2 = 1
                  THEN ${Multimodal.ImaStepTable.mkString("[", ",", "]")}[si + 1] ELSE 0 END ))),
          GREATEST(0, LEAST(88, si +
            ${Multimodal.ImaIndexTable.mkString("[", ",", "]")}[((i*7 + id*13) % 16) + 1]))
        FROM r WHERE i < n)
      SELECT id AS doc_id, CAST(n + 1 AS BIGINT) AS n_vals,
             CAST(SUM(pred) AS BIGINT) AS sum_v,
             CAST(MIN(pred) AS BIGINT) AS min_v,
             CAST(MAX(pred) AS BIGINT) AS max_v,
             CAST(SUM(pred * i) AS BIGINT) AS sum_xi
      FROM r GROUP BY id, n ORDER BY doc_id""") { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") < 60)
        .select("doc_id").as[Long]
        .map { id =>
          val n = (40 + 2 * (id % 16)).toInt
          val p0 = ((id * 29) % 4001).toInt - 2000
          val s0 = (id % 89).toInt
          val nibbles = Array.tabulate(n)(i => ((i * 7 + id * 13) % 16).toInt)
          val v = Multimodal.wavSamplesAdpcm(
              Multimodal.synthWavAdpcm(8000, p0, s0, nibbles))
            .getOrElse(sys.error(s"ADPCM decode failed for doc $id"))
          require(v.length == n + 1)
          (id, v.length.toLong, v.map(_.toLong).sum, v.min.toLong,
            v.max.toLong,
            v.zipWithIndex.map { case (s0v, i) => s0v.toLong * i }.sum)
        }
        .toDF("doc_id", "n_vals", "sum_v", "min_v", "max_v", "sum_xi")
        .orderBy("doc_id")
    }
  )
}
