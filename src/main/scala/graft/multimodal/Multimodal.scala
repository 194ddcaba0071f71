package graft.multimodal

import java.security.MessageDigest

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * decoded/feature-extracted in partition-local batches.
  *
  * This is a NEW surface beyond the reference (a training-data pipeline need):
  * image/audio/video travel as binary columns; decode runs inside
  * `mapPartitions` in fixed-size batches — the JVM analog of `mapInPandas`
  * batch processing: one codec init per partition, bounded batch memory, rows
  * stream through. Decode depth per modality:
  *  - image: REAL — header dims for PNG/GIF/JPEG, and full PIXEL decode for
  *    PNG ([[decodePng]]: zlib IDAT + all five spec filters — the JVM ships
  *    the inflater, no codec lib needed), GIF ([[decodeGif]]: plain-JVM
  *    LZW + interlace reorder — GIF's only compression is a dictionary
  *    coder) AND baseline JPEG ([[Jpeg.decodeJpeg]]: clean-room canonical
  *    Huffman entropy decode + dequant + float IDCT, T.81);
  *  - audio: REAL — WAV chunk walk + PCM SAMPLE decode ([[wavSamples]]);
  *  - video: container metadata is REAL (MP4 box walk), and FRAME decode is
  *    real for uncompressed AVI ([[aviFrames]]: RIFF chunk walk into the
  *    movi list, raw '00db' frames) AND MJPEG AVI ([[aviMjpegFrames]]:
  *    '00dc' chunks, one baseline JPEG per frame; r9 adds MS Video 1 CRAM
  *    inter-frame decode in [[MsVideo1]]) — only motion-COMPENSATED
  *    predicted codecs (H.26x, VPx) remain the clearly-marked STUB: they
  *    genuinely need a codec library this container does not ship.
  */
object Multimodal {

  final case class MediaRecord(id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      id: Long, kind: String, n_bytes: Int, sha: String,
      width: Int, height: Int)

  /** Stand-in ingest: wrap a string column as the opaque binary payload. */
  def payloadFrom(df: DataFrame, idCol: String, textCol: String,
                  kind: String = "image"): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** REAL container-header dimension parse for the three formats whose
    * headers are parseable without a codec library:
    *  - PNG: 8-byte magic, then the IHDR chunk puts big-endian width/height
    *    at bytes 16-19 / 20-23 (PNG spec §11.2.2);
    *  - GIF: "GIF87a"/"GIF89a", then little-endian u16 width/height at
    *    bytes 6-7 / 8-9 (GIF89a spec §18);
    *  - JPEG: variable-length marker walk from SOI (FFD8) to the first SOF
    *    frame header (markers C0-CF minus C4/C8/CC — baseline, progressive,
    *    lossless, arithmetic variants all share the layout), which carries
    *    big-endian u16 height then width after the precision byte
    *    (ITU-T T.81 §B.2.2). Fill bytes (repeated FF) are legal between
    *    segments; standalone markers (RST/SOI/EOI) carry no length field;
    *    the walk stops at SOS — a SOF always precedes the scan data.
    * This is the cheap metadata-only path; full pixel decode is real for
    * PNG/GIF ([[decodePng]]/[[decodeGif]]) and JPEG ([[Jpeg.decodeJpeg]]). */
  def headerDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    if (p.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a)
      Some((
        (u8(16) << 24) | (u8(17) << 16) | (u8(18) << 8) | u8(19),
        (u8(20) << 24) | (u8(21) << 16) | (u8(22) << 8) | u8(23)))
    else if (p.length >= 10 &&
        u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      Some((u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8)
      jpegSofDims(p)
    else None
  }

  /** JPEG marker walk (see [[headerDims]] doc). Returns (width, height) from
    * the first SOFn segment, None on truncated/corrupt streams. */
  private def jpegSofDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    var i = 2
    while (i + 1 < p.length && u8(i) == 0xff) {
      var j = i + 1
      while (j < p.length && u8(j) == 0xff) j += 1 // skip fill bytes
      if (j >= p.length) return None
      val m = u8(j)
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        // SOF: [len u16][precision u8][height u16][width u16]...
        return if (j + 7 < p.length)
          Some(((u8(j + 6) << 8) | u8(j + 7), (u8(j + 4) << 8) | u8(j + 5)))
        else None
      } else if (m == 0xd9 || m == 0xda) {
        return None // EOI / SOS before any SOF: no frame header present
      } else if (m >= 0xd0 && m <= 0xd8) {
        i = j + 1 // standalone marker, no length field
      } else {
        if (j + 2 >= p.length) return None
        val len = (u8(j + 1) << 8) | u8(j + 2) // includes the 2 length bytes
        if (len < 2) return None
        i = j + 1 + len
      }
    }
    None
  }

  /** Audio metadata from a WAV/RIFF container header — REAL parse, no codec:
    * chunk walk from "RIFF....WAVE" to the "fmt " chunk (channels u16le,
    * sample rate u32le, bits u16le, block align u16le) and the "data" chunk
    * (frame count = data size / block align). Returns
    * (channels, sampleRate, bitsPerSample, nFrames); nFrames −1 when no data
    * chunk precedes truncation. Sample decode is real for PCM
    * ([[wavSamples]]), G.711 ([[wavSamplesG711]]) and IMA-ADPCM
    * ([[wavSamplesAdpcm]]); perceptual codecs (MP3/AAC) are out of scope. */
  final case class WavInfo(channels: Int, sampleRate: Int,
                           bitsPerSample: Int, nFrames: Long)

  def wavHeader(p: Array[Byte]): Option[WavInfo] = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) =
      i + 4 <= p.length && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    // Long cursor: a hostile u32 chunk size must not overflow the index
    // arithmetic into a negative (or wrapped-positive) array access
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var frames = -1L
    while (i + 8 <= p.length && (fmt.isEmpty || frames < 0)) {
      val at = i.toInt
      val size = u32(at + 4)
      if (tag(at, "fmt ") && size >= 16 && i + 8 + 16 <= p.length)
        fmt = Some((u16(at + 10), u32(at + 12).toInt, u16(at + 22), u16(at + 20)))
      else if (tag(at, "data"))
        frames = fmt match {
          case Some((_, _, _, ba)) if ba > 0 => size / ba
          case _ => -1L
        }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    fmt.map { case (c, r, b, _) => WavInfo(c, r, b, frames) }
  }

  /** Video metadata from an MP4 / ISO-BMFF container — REAL parse, no codec:
    * big-endian box walk at the top level (size u32, type 4cc; size==1 takes
    * a u64 largesize, size==0 runs to EOF) into the `moov` container, then
    * its `mvhd` movie header (version 0: u32 timescale + u32 duration at
    * offsets 12/16 of the box payload; version 1: u64 times, timescale at 20,
    * duration u64 at 24). Returns (timescale ticks/sec, duration ticks);
    * seconds = duration / timescale. Frame decode for MP4 payloads needs an
    * motion-compensated codec (H.26x/VPx) — the one declared stub boundary
    * (frame-DIFFERENCING inter-frame decode is real since r9: [[MsVideo1]]).
    * Overflow-safe Long cursors, like [[wavHeader]]. */
  final case class Mp4Info(timescale: Long, duration: Long)

  def mp4Header(p: Array[Byte]): Option[Mp4Info] = {
    def u8(i: Long) = p(i.toInt) & 0xffL
    def u32(i: Long): Long =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    def typ(i: Long): String =
      if (i + 8 > p.length) ""
      else new String(p, i.toInt + 4, 4, "US-ASCII")
    // (start, end) of each box's PAYLOAD within [from, to); None to stop
    def walk(from: Long, to: Long, want: String): Option[(Long, Long)] = {
      var i = from
      while (i + 8 <= to) {
        val size0 = u32(i)
        val (payload, end) =
          if (size0 == 1L && i + 16 <= to) (i + 16, i + u64(i + 8))
          else if (size0 == 0L) (i + 8, to)
          else (i + 8, i + size0)
        if (end <= i || end > to) return None // corrupt size: stop walking
        if (typ(i) == want) return Some((payload, end))
        i = end
      }
      None
    }
    if (p.length < 8) return None
    // sanity: a real MP4 leads with ftyp/styp (or moov directly in fragments)
    val lead = typ(0)
    if (lead != "ftyp" && lead != "styp" && lead != "moov") return None
    walk(0, p.length.toLong, "moov").flatMap { case (ms, me) =>
      walk(ms, me, "mvhd").flatMap { case (hs, he) =>
        if (hs + 4 > he) None
        else u8(hs) match { // fullbox version
          case 0L if hs + 20 <= he => Some(Mp4Info(u32(hs + 12), u32(hs + 16)))
          case 1L if hs + 32 <= he => Some(Mp4Info(u32(hs + 20), u64(hs + 24)))
          case _ => None
        }
      }
    }
  }

  // ---- REAL pixel/sample decode for the two formats the JVM can decode
  // with zero codec dependencies: PNG's IDAT is zlib (java.util.zip.Inflater)
  // plus the five spec filters, and WAV PCM samples are plain
  // byte-addressable integers after the chunk walk above. Together with the
  // JPEG codec ([[Jpeg]]), GIF/LZW below, and the G.711/ADPCM expanders,
  // these retire the image/audio decode stub; only motion-compensated codecs
  // (H.26x/VPx) remain stubbed.

  /** Decoded PNG: 8-bit samples row-major, channel-interleaved, 0-255. */
  final case class PngImage(width: Int, height: Int, channels: Int,
                            pixels: Array[Int])

  /** Full PNG decode (PNG spec, ISO/IEC 15948): chunk walk → concatenated
    * IDAT zlib stream → Inflater → per-scanline unfilter (None/Sub/Up/
    * Average/Paeth, §9.2). Supports the ubiquitous 8-bit-depth layouts:
    * grayscale (type 0), RGB (2), gray+alpha (4), RGBA (6), non-interlaced.
    * Returns None on anything else or on corrupt/truncated streams. */
  def decodePng(p: Array[Byte]): Option[PngImage] = {
    def u8(i: Int) = p(i) & 0xff
    def u32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (p.length < 8 ||
        u8(0) != 0x89 || u8(1) != 'P' || u8(2) != 'N' || u8(3) != 'G' ||
        u8(4) != 0x0d || u8(5) != 0x0a || u8(6) != 0x1a || u8(7) != 0x0a)
      return None
    var i = 8L
    var dims: Option[(Int, Int, Int)] = None // w, h, channels
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= p.length) {
      val at = i.toInt
      val len = u32(at)
      val typ = new String(p, at + 4, 4, "US-ASCII")
      if (i + 12 + len > p.length) return None // truncated chunk
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          val (bitDepth, colorType) = (u8(at + 16), u8(at + 17))
          val interlace = u8(at + 20)
          val ch = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 0
          }
          if (bitDepth != 8 || ch == 0 || interlace != 0) return None
          dims = Some((u32(at + 8).toInt, u32(at + 12).toInt, ch))
        case "IDAT" => idat.write(p, at + 8, len.toInt)
        case "IEND" => i = p.length.toLong // stop the walk
        case _ => () // ancillary chunk: skip
      }
      i += 12 + len // len + type(4) + length(4) + crc(4)
    }
    dims.flatMap { case (w, h, ch) =>
      val stride = w * ch
      val raw = new Array[Byte](h * (1 + stride))
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      val n = try inf.inflate(raw) catch {
        case _: java.util.zip.DataFormatException => -1
      } finally inf.end()
      if (n != raw.length) None
      else {
        // unfilter in place into the output; a=left, b=up, c=upper-left
        val out = new Array[Int](h * stride)
        var y = 0
        while (y < h) {
          val rowIn = y * (1 + stride) + 1
          val rowOut = y * stride
          val filter = raw(rowIn - 1) & 0xff
          var x = 0
          while (x < stride) {
            val cur = raw(rowIn + x) & 0xff
            val a = if (x >= ch) out(rowOut + x - ch) else 0
            val b = if (y > 0) out(rowOut - stride + x) else 0
            val c = if (y > 0 && x >= ch) out(rowOut - stride + x - ch) else 0
            val v = filter match {
              case 0 => cur
              case 1 => cur + a
              case 2 => cur + b
              case 3 => cur + (a + b) / 2
              case 4 => // Paeth predictor (§9.4)
                val pr = a + b - c
                val (pa, pb, pc) =
                  (math.abs(pr - a), math.abs(pr - b), math.abs(pr - c))
                cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
              case _ => return None
            }
            out(rowOut + x) = v & 0xff
            x += 1
          }
          y += 1
        }
        Some(PngImage(w, h, ch, out))
      }
    }
  }

  /** Full PNG ENCODER twin of [[decodePng]] — real IHDR/IDAT/IEND with CRCs
    * and zlib-deflated scanlines. Filter types deliberately CYCLE 0-4 by row
    * so a round-trip exercises every unfilter path, not just None.
    * `pixels` are 8-bit samples, row-major, channel-interleaved. */
  def encodePng(width: Int, height: Int, channels: Int,
                pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == width * height * channels, "pixel count mismatch")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case c => sys.error(s"unsupported channel count $c")
    }
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ payload
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      be32(payload.length.toLong) ++ body ++ be32(crc.getValue)
    }
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val filter = y % 5
      raw(y * (1 + stride)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = pixels(y * stride + x)
        val a = if (x >= channels) pixels(y * stride + x - channels) else 0
        val b = if (y > 0) pixels((y - 1) * stride + x) else 0
        val c = if (y > 0 && x >= channels)
          pixels((y - 1) * stride + x - channels) else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val pr = a + b - c
            val (pa, pb, pc) =
              (math.abs(pr - a), math.abs(pr - b), math.abs(pr - c))
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (1 + stride) + 1 + x) = enc.toByte
        x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    val ihdr = be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** PCM sample decode from a WAV container — the data chunk read through the
    * SAME chunk walk as [[wavHeader]]: signed 16-bit little-endian or
    * unsigned 8-bit (recentred to signed, per WAV convention), interleaved
    * across channels in container order. None for float/24-bit/compressed
    * formats (codec territory) or when no data chunk exists. */
  def wavSamples(p: Array[Byte]): Option[Array[Int]] = {
    def u8(i: Int) = p(i) & 0xff
    def tag(i: Int, s: String) =
      i + 4 <= p.length && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    wavHeader(p).filter(w => w.bitsPerSample == 16 || w.bitsPerSample == 8)
      .flatMap { info =>
        var i = 12L
        while (i + 8 <= p.length) {
          val at = i.toInt
          val size = u32(at + 4)
          // a non-PCM format tag (G.711 = 6/7, true codecs beyond) must not
          // be mis-read as raw PCM bytes — [[wavSamplesG711]] owns 6/7
          if (tag(at, "fmt ") && size >= 16 && i + 8 + 16 <= p.length &&
              u16(at + 8) != 1) return None
          if (tag(at, "data")) {
            val end = math.min(at + 8 + size, p.length.toLong).toInt
            val bytesPer = info.bitsPerSample / 8
            val n = (end - (at + 8)) / bytesPer
            val out = new Array[Int](n)
            var k = 0
            while (k < n) {
              out(k) =
                if (bytesPer == 2) // s16le
                  (u8(at + 8 + 2 * k) | (u8(at + 9 + 2 * k) << 8)).toShort.toInt
                else u8(at + 8 + k) - 128 // u8 recentred
              k += 1
            }
            return Some(out)
          }
          i += 8L + size + (size & 1L)
        }
        None
      }
  }

  /** G.711 companded-audio expansion (ITU-T G.711; formulas per the classic
    * public-domain Sun Microsystems g711.c): one encoded byte → one linear
    * 16-bit sample. μ-law (WAV format tag 7): complement, then
    * `(((mant<<3)+0x84)<<exp) - 0x84` with the sign from bit 7 of the
    * complemented code. A-law (tag 6): XOR 0x55, then a segment-folded
    * expansion (`seg==0 → (mant<<4)+8; seg==1 → (mant<<4)+0x108; else
    * ((mant<<4)+0x108)<<(seg-1)`). Pure 16-bit integer arithmetic — no
    * tables — so a DuckDB CASE expression replays it bit-for-bit.
    * Reference values: μ-law 0x00 → −32124, 0xFF → 0; A-law 0x55 → −8,
    * 0x2A → −32256 (asserted in G711Spec). */
  def g711ToLinear(code: Int, aLaw: Boolean): Int =
    if (aLaw) {
      val a = (code ^ 0x55) & 0xff
      val seg = (a >> 4) & 7
      val mant = a & 0x0f
      val t =
        if (seg == 0) (mant << 4) + 8
        else if (seg == 1) (mant << 4) + 0x108
        else ((mant << 4) + 0x108) << (seg - 1)
      if ((a & 0x80) != 0) t else -t
    } else {
      val u = (~code) & 0xff
      val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }

  /** G.711 WAV decode: the SAME RIFF chunk walk as [[wavSamples]], but for
    * format tag 6 (A-law) / 7 (μ-law) at 8 bits per sample — each data byte
    * expands through [[g711ToLinear]]. None for any other format tag (PCM
    * goes through [[wavSamples]], IMA-ADPCM through [[wavSamplesAdpcm]];
    * perceptual codecs MP3/AAC are out of scope). */
  def wavSamplesG711(p: Array[Byte]): Option[Array[Int]] = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int, s: String) =
      i + 4 <= p.length && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12L
    var fmtTag = -1
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = u32(at + 4)
      if (tag(at, "fmt ") && size >= 16 && i + 8 + 16 <= p.length) {
        fmtTag = u16(at + 8)
        if ((fmtTag != 6 && fmtTag != 7) || u16(at + 22) != 8) return None
      } else if (tag(at, "data") && fmtTag >= 0) {
        val end = math.min(at + 8 + size, p.length.toLong).toInt
        return Some(Array.tabulate(end - (at + 8))(k =>
          g711ToLinear(u8(at + 8 + k), aLaw = fmtTag == 6)))
      }
      i += 8L + size + (size & 1L)
    }
    None
  }

  /** IMA ADPCM step-size table (89 entries) and index-adjust table — the
    * published constants from the IMA Digital Audio Focus Group algorithm
    * (as shipped in every public implementation since the 1992 spec). */
  val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble step: given (predictor, stepIndex) state and a
    * 4-bit code, returns the next (predictor, stepIndex). Pure integer
    * arithmetic (shifts, adds, clamps) — the oracle replays it as a DuckDB
    * recursive CTE carrying the same two-register state. */
  def imaStep(pred: Int, stepIndex: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(stepIndex)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p = if ((nibble & 8) != 0) pred - diff else pred + diff
    val clamped = math.max(-32768, math.min(32767, p))
    val si = math.max(0, math.min(88, stepIndex + ImaIndexTable(nibble)))
    (clamped, si)
  }

  /** IMA ADPCM WAV decode (format tag 0x11, mono, 4 bits/sample): the SAME
    * RIFF chunk walk, then per-block decode — each `blockAlign`-sized block
    * opens with a 4-byte header (initial predictor s16le, step index u8,
    * reserved u8) that IS sample 0, followed by nibble pairs (low nibble
    * first, per the IMA WAV convention). When the extended fmt chunk carries
    * samplesPerBlock, per-block emission is capped at it (the last block of
    * a conforming file may pad with nibbles that are not samples). None for
    * other tags/layouts. */
  def wavSamplesAdpcm(p: Array[Byte]): Option[Array[Int]] = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def tag(i: Int, s: String) =
      i + 4 <= p.length && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12L
    var blockAlign = -1
    var samplesPerBlock = -1
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = u32(at + 4)
      if (tag(at, "fmt ") && size >= 16 && i + 8 + 16 <= p.length) {
        if (u16(at + 8) != 0x11 || u16(at + 10) != 1 || u16(at + 22) != 4)
          return None
        blockAlign = u16(at + 20)
        if (blockAlign < 4) return None
        // extended fmt (cbSize >= 2): samplesPerBlock caps how many samples
        // each block REALLY carries — a conforming file's LAST block may
        // imply more nibbles than it has samples, and decoding them all
        // would emit garbage trailing samples
        if (size >= 20 && i + 8 + 20 <= p.length && u16(at + 24) >= 2)
          samplesPerBlock = u16(at + 26)
      } else if (tag(at, "data") && blockAlign > 0) {
        val end = math.min(at + 8 + size, p.length.toLong).toInt
        val cap = if (samplesPerBlock > 0) samplesPerBlock else Int.MaxValue
        val out = Array.newBuilder[Int]
        var b = at + 8
        while (b + 4 <= end) {
          val blockEnd = math.min(b + blockAlign, end)
          var pred = (u8(b) | (u8(b + 1) << 8)).toShort.toInt
          var si = math.min(88, u8(b + 2))
          out += pred
          var emitted = 1
          var j = b + 4
          while (j < blockEnd && emitted < cap) {
            val byte = u8(j)
            val s1 = imaStep(pred, si, byte & 0x0f)
            pred = s1._1; si = s1._2
            if (emitted < cap) { out += pred; emitted += 1 }
            val s2 = imaStep(pred, si, byte >> 4)
            pred = s2._1; si = s2._2
            if (emitted < cap) { out += pred; emitted += 1 }
            j += 1
          }
          b += blockAlign
        }
        return Some(out.result())
      }
      i += 8L + size + (size & 1L)
    }
    None
  }

  /** Uncompressed-AVI video: header + raw frames. AVI is RIFF (the same
    * container family as WAV): `RIFF('AVI ')` wraps a `LIST('hdrl')` whose
    * `avih` main header carries total frames / width / height (OpenDML AVI
    * spec), and a `LIST('movi')` whose `00db` chunks are uncompressed
    * device-independent-bitmap frames — for 8-bit gray, one byte per pixel.
    * This is REAL video frame decode with zero codec dependencies; compressed
    * `00dc` streams decode through [[Jpeg.aviMjpegFrames]] when the codec is
    * MJPG, and MS Video 1 CRAM streams through [[MsVideo1.aviCramFrames]] —
    * motion-compensated codecs (H.26x/VPx) remain the stub boundary. */
  final case class AviInfo(width: Int, height: Int, nFrames: Int)

  def aviHeader(p: Array[Byte]): Option[AviInfo] = {
    def u8(i: Int) = p(i) & 0xff
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) =
      i + 4 <= p.length && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    // top-level chunk walk for LIST('hdrl') → avih; overflow-safe cursor
    var i = 12L
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = u32(at + 4)
      if (tag(at, "LIST") && tag(at + 8, "hdrl")) {
        var j = i + 12
        val end = math.min(i + 8 + size, p.length.toLong)
        while (j + 8 <= end) {
          val ja = j.toInt
          val jsize = u32(ja + 4)
          if (tag(ja, "avih") && jsize >= 40 && j + 8 + 40 <= end)
            return Some(AviInfo(u32(ja + 8 + 32).toInt, u32(ja + 8 + 36).toInt,
              u32(ja + 8 + 16).toInt))
          j += 8L + jsize + (jsize & 1L)
        }
        return None // hdrl without avih: corrupt
      }
      i += 8L + size + (size & 1L)
    }
    None
  }

  /** Raw frames from the movi list: each `00db` chunk's bytes verbatim,
    * in stream order. None when the container is not AVI or holds a
    * compressed (`00dc`) stream — codec territory. */
  def aviFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
    def u8(i: Int) = p(i) & 0xff
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) =
      i + 4 <= p.length && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var i = 12L
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = u32(at + 4)
      if (tag(at, "LIST") && tag(at + 8, "movi")) {
        val out = ArrayBuffer.empty[Array[Byte]]
        var j = i + 12
        val end = math.min(i + 8 + size, p.length.toLong)
        while (j + 8 <= end) {
          val ja = j.toInt
          val jsize = u32(ja + 4)
          if (j + 8 + jsize > end) return None // truncated frame chunk
          if (tag(ja, "00dc")) return None     // compressed: needs a codec
          if (tag(ja, "00db"))
            out += java.util.Arrays.copyOfRange(p, ja + 8, ja + 8 + jsize.toInt)
          j += 8L + jsize + (jsize & 1L)
        }
        return Some(out.toSeq)
      }
      i += 8L + size + (size & 1L)
    }
    None
  }

  /** MJPEG-in-AVI frame decode: walks the SAME movi list as [[aviFrames]]
    * but expects compressed `00dc` chunks, each a complete baseline JPEG
    * stream (MJPEG is exactly that — one independent JPEG per frame), and
    * decodes them through [[Jpeg.decodeJpeg]]. This retires the MJPEG slice
    * of the video stub; motion-compensated codecs (H.26x) remain the one
    * genuine codec-library dependency. None when the container is not AVI
    * or any frame fails the JPEG decode. */
  def aviMjpegFrames(p: Array[Byte]): Option[Seq[Jpeg.JpegImage]] = {
    def u8(i: Int) = p(i) & 0xff
    def u32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String) =
      i + 4 <= p.length && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (p.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var i = 12L
    while (i + 8 <= p.length) {
      val at = i.toInt
      val size = u32(at + 4)
      if (tag(at, "LIST") && tag(at + 8, "movi")) {
        val out = ArrayBuffer.empty[Jpeg.JpegImage]
        var j = i + 12
        val end = math.min(i + 8 + size, p.length.toLong)
        while (j + 8 <= end) {
          val ja = j.toInt
          val jsize = u32(ja + 4)
          if (j + 8 + jsize > end) return None // truncated frame chunk
          if (tag(ja, "00dc")) {
            val frame = java.util.Arrays.copyOfRange(p, ja + 8, ja + 8 + jsize.toInt)
            Jpeg.decodeJpeg(frame) match {
              case Some(img) => out += img
              case None      => return None // not MJPEG / corrupt frame
            }
          }
          j += 8L + jsize + (jsize & 1L)
        }
        return Some(out.toSeq)
      }
      i += 8L + size + (size & 1L)
    }
    None
  }

  /** MJPEG twin of [[synthAvi]]: the same RIFF skeleton, but each frame is a
    * complete JPEG stream carried in a `00dc` (compressed) chunk. */
  def synthAviMjpeg(w: Int, h: Int, jpegFrames: Seq[Array[Byte]]): Array[Byte] =
    synthAviCompressed(w, h, jpegFrames)

  /** Generic compressed-AVI synth: per-frame codec byte streams in `00dc`
    * chunks (MJPEG JPEGs, [[MsVideo1]] CRAM code streams, ...). */
  def synthAviCompressed(w: Int, h: Int, frameStreams: Seq[Array[Byte]]): Array[Byte] =
    synthAviWith(w, h, frameStreams, "00dc")

  /** Minimal VALID uncompressed AVI: RIFF('AVI ') { LIST('hdrl'){avih},
    * LIST('movi'){00db × frames} }. 8-bit gray, one byte per pixel. */
  def synthAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == w * h), "each frame must be w*h bytes")
    synthAviWith(w, h, frames, "00db")
  }

  private def synthAviWith(w: Int, h: Int, frames: Seq[Array[Byte]],
                           frameTag: String): Array[Byte] = {
    def le32(v: Long) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte,
      (v >> 24).toByte)
    def chunk(t: String, payload: Array[Byte]): Array[Byte] = {
      val padded =
        if (payload.length % 2 == 1) payload :+ 0.toByte else payload
      t.getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ padded
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes("US-ASCII") ++ le32(4L + body.length) ++
        kind.getBytes("US-ASCII") ++ body
    // avih: 56-byte main header; the parser reads totalframes(16),
    // width(32), height(36) — the rest zeroed
    val avih = new Array[Byte](56)
    def put32(off: Int, v: Long): Unit =
      le32(v).copyToArray(avih, off)
    put32(16, frames.length.toLong)
    put32(32, w.toLong)
    put32(36, h.toLong)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.toArray.flatMap(f => chunk(frameTag, f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  // ---- GIF: full pixel decode. GIF's only compression is LZW (GIF89a spec
  // appendix F) — a dictionary coder implementable in plain JVM code, no
  // codec library. This retires the GIF slice of the image-decode stub the
  // same way Inflater retired PNG's.

  /** One decoded GIF frame: palette indices row-major (de-interlaced if the
    * image descriptor set the interlace flag) + the active color table as
    * 0xRRGGBB ints. */
  final case class GifImage(width: Int, height: Int, interlaced: Boolean,
                            indices: Array[Byte], palette: Array[Int])

  /** Decode the FIRST image of a GIF87a/89a stream: logical screen
    * descriptor, global/local color table, extension-block skip, then LZW
    * decompression of the pixel indices (variable code width 3..12 bits
    * LSB-first, CLEAR/END codes, KwKwK case) and interlace reordering
    * (four-pass row schedule, spec §20). Returns None on any malformed
    * structure — total, never throws.
    *
    * Scope note: the image descriptor's left/top offsets are IGNORED — the
    * returned raster is the first image's OWN pixels at its own dims,
    * without placement into (or cross-checking against) the logical screen.
    * Real-world GIFs whose first frame sits inside a larger logical screen
    * decode to the sub-image only. */
  def decodeGif(p: Array[Byte]): Option[GifImage] = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (p.length < 13) return None
    val magic = new String(p, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val packed = u8(10)
    var pos = 13
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      if (pos + 3 * n > p.length) return None
      palette = Array.tabulate(n)(i =>
        (u8(pos + 3 * i) << 16) | (u8(pos + 3 * i + 1) << 8) | u8(pos + 3 * i + 2))
      pos += 3 * n
    }
    while (pos < p.length) {
      u8(pos) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + length-prefixed sub-blocks
          pos += 2
          while (pos < p.length && u8(pos) != 0) pos += 1 + u8(pos)
          if (pos >= p.length) return None
          pos += 1
        case 0x2c => // image descriptor
          if (pos + 10 > p.length) return None
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          val ipacked = u8(pos + 9)
          val interlaced = (ipacked & 0x40) != 0
          pos += 10
          var pal = palette
          if ((ipacked & 0x80) != 0) {
            val n = 1 << ((ipacked & 7) + 1)
            if (pos + 3 * n > p.length) return None
            pal = Array.tabulate(n)(i =>
              (u8(pos + 3 * i) << 16) | (u8(pos + 3 * i + 1) << 8) | u8(pos + 3 * i + 2))
            pos += 3 * n
          }
          if (pal == null || pos >= p.length) return None
          val minCode = u8(pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          val data = ArrayBuffer.empty[Byte]
          while (pos < p.length && u8(pos) != 0) {
            val n = u8(pos)
            if (pos + 1 + n > p.length) return None
            data ++= p.slice(pos + 1, pos + 1 + n)
            pos += 1 + n
          }
          if (pos >= p.length) return None
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1 << 26)) return None
          val raw = lzwDecode(minCode, data.toArray, iw * ih).getOrElse(return None)
          val out = if (!interlaced) raw else deinterlace(raw, iw, ih)
          return Some(GifImage(iw, ih, interlaced, out, pal))
        case _ => return None
      }
    }
    None
  }

  /** GIF-flavor LZW decode: codes start at minCode+1 bits, dictionary
    * entries (prefix-chain, suffix byte) grow to 4096; CLEAR resets, END
    * stops, code == next-free is the KwKwK case (string(prev) + its own
    * first byte). Bits are packed LSB-first. */
  private def lzwDecode(minCode: Int, data: Array[Byte],
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val endCode = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = clear + 2
    var width = minCode + 1
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    val out = new ArrayBuffer[Byte](expected)
    val stack = new Array[Byte](4096)
    var bitPos = 0
    val nBits = data.length * 8
    def read(): Int = {
      if (bitPos + width > nBits) -1
      else {
        var v = 0; var b = 0
        while (b < width) {
          val bit = (data((bitPos + b) >> 3) >> ((bitPos + b) & 7)) & 1
          v |= bit << b
          b += 1
        }
        bitPos += width
        v
      }
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c)
    }
    def emit(code: Int): Unit = {
      var c = code; var top = 0
      while (c >= 0) { stack(top) = suffix(c); top += 1; c = prefix(c) }
      while (top > 0) { top -= 1; out += stack(top) }
    }
    var prev = -1
    var done = false
    while (!done && out.length < expected) {
      val code = read()
      if (code < 0 || code == endCode) done = true
      else if (code == clear) { next = clear + 2; width = minCode + 1; prev = -1 }
      else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        emit(code); prev = code
      } else if (code < next) {
        emit(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = firstByte(code); next += 1
          if (next < 4096 && next == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else if (code == next && next < 4096) { // KwKwK: string(prev)+first
        prefix(next) = prev; suffix(next) = firstByte(prev); next += 1
        emit(code) // the entry just added
        if (next < 4096 && next == (1 << width) && width < 12) width += 1
        prev = code
      } else return None
    }
    if (out.length != expected) None else Some(out.toArray)
  }

  /** Undo the four-pass interlace row schedule (GIF89a spec §20). */
  private def deinterlace(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](raw.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
         row <- start until h by step) {
      System.arraycopy(raw, src * w, out, row * w, w)
      src += 1
    }
    out
  }

  /** Encoder twin: minimal VALID GIF89a with a global color table, one
    * (optionally interlaced) image, REAL LZW compression (hash-chained
    * dictionary, width growth, 4096-reset) — so the decoder round-trip
    * exercises the same code paths a real-world GIF would. Palette length
    * must be a power of two in [4, 256]. */
  def synthGif(w: Int, h: Int, indices: Array[Byte], palette: Array[Int],
               interlaced: Boolean = false): Array[Byte] = {
    require(indices.length == w * h, "indices must be w*h bytes")
    val n = palette.length
    require(n >= 4 && n <= 256 && Integer.bitCount(n) == 1,
      s"palette size must be a power of two in [4, 256], got $n")
    val bits = Integer.numberOfTrailingZeros(n)
    val minCode = math.max(2, bits)
    require(indices.forall(b => (b & 0xff) < n), "index out of palette")

    val rowOrder =
      if (!interlaced) 0 until h
      else Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap {
        case (s0, st) => s0 until h by st
      }
    val px = new Array[Byte](indices.length)
    var o = 0
    rowOrder.foreach { r =>
      System.arraycopy(indices, r * w, px, o * w, w); o += 1
    }

    // LZW encode
    val clear = 1 << minCode
    val endCode = clear + 1
    val bitBuf = ArrayBuffer.empty[Byte]
    var acc = 0L; var nAcc = 0; var width = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += width
      while (nAcc >= 8) { bitBuf += (acc & 0xff).toByte; acc >>>= 8; nAcc -= 8 }
    }
    var dict = scala.collection.mutable.HashMap.empty[Long, Int]
    var next = clear + 2
    put(clear)
    var cur = px(0) & 0xff
    var i = 1
    while (i < px.length) {
      val c = px(i) & 0xff
      val key = (cur.toLong << 8) | c
      dict.get(key) match {
        case Some(code) => cur = code
        case None =>
          put(cur)
          if (next < 4096) {
            dict(key) = next; next += 1
            if (next <= 4096 && next - 1 == (1 << width) && width < 12) width += 1
          } else { // table full: reset, mirroring the decoder's CLEAR path
            put(clear); dict = scala.collection.mutable.HashMap.empty
            next = clear + 2; width = minCode + 1
          }
          cur = c
      }
      i += 1
    }
    put(cur); put(endCode)
    if (nAcc > 0) bitBuf += (acc & 0xff).toByte

    val out = ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes("US-ASCII")
    def le16(v: Int): Unit = { out += v.toByte; out += (v >> 8).toByte }
    le16(w); le16(h)
    out += (0x80 | (bits - 1)).toByte // GCT present, size 2^bits
    out += 0.toByte; out += 0.toByte  // bg index, aspect
    palette.foreach { rgb =>
      out += (rgb >> 16).toByte; out += (rgb >> 8).toByte; out += rgb.toByte
    }
    out += 0x2c.toByte // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out += (if (interlaced) 0x40 else 0x00).toByte
    out += minCode.toByte
    bitBuf.grouped(255).foreach { blk =>
      out += blk.length.toByte; out ++= blk
    }
    out += 0.toByte    // data terminator
    out += 0x3b.toByte // trailer
    out.toArray
  }

  // ---- deterministic synthetic container builders: minimal, VALID headers
  // (the exact bytes the parsers above walk) so the binary-column round-trip
  // can be gate-checked against a SQL oracle without codec libraries or
  // binary fixtures on disk (q_media_metadata).

  def synthPng(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R').map(_.toByte) ++ be32(w) ++ be32(h)
  }

  /** Zero-filled payload at ANY bit depth (metadata round-trips only). */
  def synthWav(channels: Int, rate: Int, bits: Int, frames: Int): Array[Byte] = {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val blockAlign = channels * bits / 8
    val dataSize = frames * blockAlign
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataSize) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(dataSize) ++ Array.fill(dataSize)(0.toByte)
  }

  /** WAV with REAL PCM payload (s16le or u8 from recentred signed samples) —
    * the encode twin of [[wavSamples]]. */
  def synthWavPcm(channels: Int, rate: Int, bits: Int,
                  samples: Array[Int]): Array[Byte] = {
    require(bits == 8 || bits == 16, s"PCM bits must be 8 or 16: $bits")
    require(samples.length % channels == 0, "samples must fill whole frames")
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val blockAlign = channels * bits / 8
    val data =
      if (bits == 16) samples.flatMap(le16)
      else samples.map(s => (s + 128).toByte)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  /** WAV carrying a G.711 payload (format tag 6 = A-law, 7 = μ-law, 8 bits
    * per sample, one code byte per sample) — the encode-side container twin
    * of [[wavSamplesG711]]. `codes` are the raw encoded bytes 0..255. */
  def synthWavG711(channels: Int, rate: Int, codes: Array[Int],
                   aLaw: Boolean): Array[Byte] = {
    require(codes.length % channels == 0, "codes must fill whole frames")
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val blockAlign = channels
    val data = codes.map(_.toByte)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(if (aLaw) 6 else 7) ++
      le16(channels) ++ le32(rate) ++ le32(rate * blockAlign) ++
      le16(blockAlign) ++ le16(8) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  /** WAV carrying one IMA ADPCM block (format tag 0x11, mono, 4-bit): the
    * encode-side container twin of [[wavSamplesAdpcm]]. The fmt chunk uses
    * the spec's extended form (cbSize=2 + samplesPerBlock u16). `nibbles`
    * must have even length; the block header carries (predictor0, stepIdx0)
    * and yields samples = nibbles.length + 1. */
  def synthWavAdpcm(rate: Int, predictor0: Int, stepIdx0: Int,
                    nibbles: Array[Int]): Array[Byte] = {
    require(nibbles.length % 2 == 0, "nibble count must be even")
    require(stepIdx0 >= 0 && stepIdx0 <= 88, s"step index 0..88: $stepIdx0")
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val blockAlign = 4 + nibbles.length / 2
    val samplesPerBlock = nibbles.length + 1
    val data = le16(predictor0) ++ Array(stepIdx0.toByte, 0.toByte) ++
      nibbles.grouped(2).map(p => ((p(0) & 0xf) | ((p(1) & 0xf) << 4)).toByte).toArray
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    "RIFF".getBytes("US-ASCII") ++ le32(40 + data.length + pad.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(20) ++ le16(0x11) ++ le16(1) ++
      le32(rate) ++ le32(rate * blockAlign / samplesPerBlock) ++
      le16(blockAlign) ++ le16(4) ++ le16(2) ++ le16(samplesPerBlock) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }

  def synthMp4(timescale: Long, duration: Long): Array[Byte] = {
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ Array.fill(80)(0.toByte))
    ftyp ++ box("moov", mvhd)
  }

  /** Decoder: REAL header parse when the payload carries a recognized image
    * container ([[headerDims]]); otherwise the clearly-marked STUB fallback
    * (deterministic fake dimensions from the first two payload bytes) a real
    * deployment replaces with a codec. */
  private[multimodal] def decodeStub(r: MediaRecord): MediaFeatures = {
    val (w, h) = headerDims(r.payload).getOrElse((
      if (r.payload.length > 0) 1 + (r.payload(0) & 0x7f) % 64 else 0,
      if (r.payload.length > 1) 1 + (r.payload(1) & 0x7f) % 64 else 0))
    val sha = MessageDigest.getInstance("SHA-256").digest(r.payload)
      .map("%02x".format(_)).mkString
    MediaFeatures(r.id, r.kind, r.payload.length, sha, w, h)
  }

  /** Batched partition-local decode/feature-extract. `batchSize` bounds the
    * number of payloads materialized at once per partition (the mapInPandas
    * batch-shape contract). */
  def extractFeatures(ds: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // grouped() keeps at most `batchSize` payloads in flight — where a real
      // codec would process the whole batch in one native call
      it.grouped(batchSize).flatMap(batch => batch.map(decodeStub))
    }
  }

  /** Resize stub: deterministic byte-subsampling to a payload sized for the
    * target dimensions (a real deployment swaps in a codec resize). Runs as a
    * narrow per-row map — at scale, resize cost is pure map-side CPU and the
    * output column shrinks shuffle/storage footprint downstream. */
  def resizeStub(ds: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val targetBytes = math.max(1, targetW * targetH)
    ds.map { r =>
      if (r.payload.length <= targetBytes) r
      else {
        val stride = r.payload.length.toDouble / targetBytes
        val out = Array.tabulate(targetBytes)(i => r.payload((i * stride).toInt))
        r.copy(payload = out)
      }
    }
  }

  /** Frame-sampling stub for video-kind payloads: every `stride`-th byte
    * starts a "frame"; emits (id, frame_index, frame_hash) rows. Demonstrates
    * the 1→N generator shape (posexplode equivalent) over binary columns. */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int = 256): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      r.payload.grouped(stride).zipWithIndex.map { case (frame, i) =>
        (r.id, i, java.util.Arrays.hashCode(frame))
      }
    }.toDF("id", "frame_index", "frame_hash")
  }
}
