package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Microsoft Video 1 ("CRAM") — a real INTER-FRAME video codec with no
  * library dependency, retiring the frame-differencing slice of the video
  * stub (reference VideoAnalysis route; SURVEY multimodal row). The format
  * is public (Video for Windows CRAM coding, widely documented): each frame
  * is a stream of little-endian 16-bit codes over 4×4 pixel blocks walked
  * in BOTTOM-UP block-row order (AVI frames are bottom-up DIBs), with four
  * ops in the 16-bit-color (RGB555) mode implemented here:
  *
  *  - SKIP   `0x8400 | count` (high byte 0x84-0x87): copy the next `count`
  *           blocks from the PREVIOUS frame — the inter-frame op;
  *  - 1-color `0x8000 | rgb555`: fill the block with one color;
  *  - 2-color `flags, colorA, colorB` (flags high bit clear, colorA high
  *           bit clear): per-pixel LSB-first flag bits pick A (set) or B;
  *  - 8-color `flags, colorA0|0x8000, colorB0, A1, B1, A2, B2, A3, B3`:
  *           like 2-color but each 2×2 quadrant has its own color pair
  *           (quadrants indexed in the same bottom-up raster order as
  *           block rows: q0 bottom-left, q1 bottom-right, q2 top-left,
  *           q3 top-right; the 8-color marker is colorA0's high bit).
  *
  * Flag bit i (LSB first) corresponds to pixel i of the block emitted
  * bottom-up: i = r·4 + cx with r the row from the BOTTOM of the block and
  * cx left→right. A 2-/8-color op word must keep bit 15 clear (that is what
  * distinguishes it from 1-color/skip), so pixel 15 — the block's TOP-RIGHT
  * pixel — always takes the B color; the encoder assigns A/B accordingly.
  * The known collision of the real format (a 1-color code for rgb555 in
  * [0x0400, 0x07FF] would read as a skip) is resolved the way real encoders
  * do: such blocks are emitted as a 2-color op with A = B.
  *
  * Fidelity note: container walk, op grammar and the skip/marker bit
  * patterns follow the published format; in-block bit order and quadrant
  * indexing follow the documented bottom-up LSB-first convention and are
  * pinned by MsVideo1Spec's hand-computed known-value decodes (no sample
  * CRAM files exist offline to byte-test third-party interop against).
  * Motion-COMPENSATED codecs (H.26x/VPx — motion vectors + transform
  * residuals) remain the declared codec-library boundary.
  *
  * Scale shape: identical to the JPEG family — decode is per-payload
  * mapPartitions batch work, embarrassingly parallel, no shuffle; the
  * inter-frame carry is per-VIDEO state inside one row's decode, never
  * cross-row state.
  */
object MsVideo1 {

  final case class OpCounts(skip: Int, one: Int, two: Int, eight: Int)

  /** Encode frames (each a TOP-DOWN row-major array of w·h rgb555 values in
    * [0, 0x7FFF]) to per-frame CRAM code streams. Lossless by contract:
    * every 4×4 block must be constant, 2-distinct, or 2-distinct per 2×2
    * quadrant (a real encoder would quantize; fixture generators produce
    * conforming content). Blocks equal to the previous frame's become SKIP
    * runs — frame 0 has no previous, so it is fully intra. */
  def encodeFrames(w: Int, h: Int, frames: Seq[Array[Int]]): Seq[Array[Byte]] = {
    require(w % 4 == 0 && h % 4 == 0, s"dims must be multiples of 4: $w x $h")
    frames.foreach(f => require(f.length == w * h, "frame size mismatch"))
    val bw = w / 4
    val bh = h / 4
    var prev: Array[Int] = null
    frames.map { cur =>
      val out = ArrayBuffer.empty[Byte]
      def word(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
      var pendingSkip = 0
      def flushSkip(): Unit =
        while (pendingSkip > 0) {
          val n = math.min(pendingSkip, 0x3ff)
          word(0x8400 | n)
          pendingSkip -= n
        }
      // block pixel order: bottom-up rows, left->right (doc above)
      def pix(bi: Int, i: Int): Int = {
        val bx = bi % bw
        val byFromBottom = bi / bw
        val r = i / 4      // row from block bottom
        val cx = i % 4
        val x = bx * 4 + cx
        val y = h - 1 - (byFromBottom * 4 + r)
        cur(y * w + x)
      }
      for (bi <- 0 until bw * bh) {
        val vals = Array.tabulate(16)(pix(bi, _))
        val same = prev != null && (0 until 16).forall { i =>
          val bx = bi % bw; val byFromBottom = bi / bw
          val x = bx * 4 + i % 4
          val y = h - 1 - (byFromBottom * 4 + i / 4)
          prev(y * w + x) == cur(y * w + x)
        }
        if (same) pendingSkip += 1
        else {
          flushSkip()
          val distinct = vals.distinct
          if (distinct.length == 1) {
            val c = distinct(0)
            if (c >= 0x0400 && c <= 0x07ff) { // skip-collision: 2-color A=B
              word(0x0000); word(c); word(c)
            } else word(0x8000 | c)
          } else if (distinct.length == 2) {
            val b = vals(15) // top-right pixel must take B (bit 15 clear)
            val a = if (distinct(0) == b) distinct(1) else distinct(0)
            var flags = 0
            for (i <- 0 until 15) if (vals(i) == a) flags |= 1 << i
            word(flags); word(a); word(b)
          } else {
            // per-quadrant pairs; quadrant q of pixel i (bottom-up order)
            def quad(i: Int): Int = (i / 4 / 2) * 2 + (i % 4 / 2)
            val pairs = Array.tabulate(4) { q =>
              val qs = (0 until 16).filter(quad(_) == q).map(vals).distinct
              require(qs.length <= 2,
                s"block $bi quadrant $q has ${qs.length} colors — not CRAM-encodable")
              qs
            }
            // pixel 15 is in quadrant 3: its value must be that pair's B
            val b3 = vals(15)
            val (a3, b3v) =
              if (pairs(3).length == 1) (pairs(3)(0), pairs(3)(0))
              else if (pairs(3)(0) == b3) (pairs(3)(1), b3)
              else (pairs(3)(0), b3)
            val ab = Array.tabulate(4) { q =>
              if (q == 3) (a3, b3v)
              else if (pairs(q).length == 1) (pairs(q)(0), pairs(q)(0))
              else (pairs(q)(0), pairs(q)(1))
            }
            var flags = 0
            for (i <- 0 until 15) if (vals(i) == ab(quad(i))._1 &&
              vals(i) != ab(quad(i))._2) flags |= 1 << i
            word(flags)
            word(0x8000 | ab(0)._1); word(ab(0)._2)
            word(ab(1)._1); word(ab(1)._2)
            word(ab(2)._1); word(ab(2)._2)
            word(ab(3)._1); word(ab(3)._2)
          }
        }
      }
      flushSkip()
      prev = cur
      out.toArray
    }
  }

  /** Decode one CRAM code stream over the previous frame (null for frame 0
    * — unskipped zeros). Returns the TOP-DOWN row-major rgb555 frame. */
  def decodeFrame(w: Int, h: Int, stream: Array[Byte],
                  prev: Array[Int]): Array[Int] = {
    require(w % 4 == 0 && h % 4 == 0, s"dims must be multiples of 4: $w x $h")
    val bw = w / 4
    val bh = h / 4
    val cur = if (prev == null) new Array[Int](w * h) else prev.clone()
    var p = 0
    def u16(): Int = {
      val v = (stream(p) & 0xff) | ((stream(p + 1) & 0xff) << 8)
      p += 2
      v
    }
    var bi = 0
    def put(i: Int, c: Int): Unit = {
      val bx = bi % bw
      val byFromBottom = bi / bw
      val x = bx * 4 + i % 4
      val y = h - 1 - (byFromBottom * 4 + i / 4)
      cur(y * w + x) = c
    }
    while (bi < bw * bh && p + 2 <= stream.length) {
      val w0 = u16()
      val hi = (w0 >> 8) & 0xff
      if ((hi & 0xfc) == 0x84) {
        bi += (w0 & 0x3ff) // skip: blocks already carry prev's pixels
      } else if (hi < 0x80) {
        val flags = w0
        val c0 = u16()
        if ((c0 & 0x8000) != 0) { // 8-color
          val cs = Array(c0 & 0x7fff, u16(), u16(), u16(), u16(), u16(), u16(), u16())
          def quad(i: Int): Int = (i / 4 / 2) * 2 + (i % 4 / 2)
          for (i <- 0 until 16)
            put(i, if (((flags >> i) & 1) == 1) cs(2 * quad(i)) else cs(2 * quad(i) + 1))
        } else { // 2-color
          val c1 = u16()
          for (i <- 0 until 16)
            put(i, if (((flags >> i) & 1) == 1) c0 else c1)
        }
        bi += 1
      } else { // 1-color
        for (i <- 0 until 16) put(i, w0 & 0x7fff)
        bi += 1
      }
    }
    cur
  }

  /** Op histogram of one stream — spec evidence that the inter-frame path
    * is actually exercised (skip > 0 on non-first frames of stable video). */
  def ops(stream: Array[Byte]): OpCounts = {
    var p = 0
    var skip = 0; var one = 0; var two = 0; var eight = 0
    def u16(): Int = {
      val v = (stream(p) & 0xff) | ((stream(p + 1) & 0xff) << 8)
      p += 2
      v
    }
    while (p + 2 <= stream.length) {
      val w0 = u16()
      val hi = (w0 >> 8) & 0xff
      if ((hi & 0xfc) == 0x84) skip += 1
      else if (hi < 0x80) {
        val c0 = u16()
        if ((c0 & 0x8000) != 0) { eight += 1; p += 14 }
        else { two += 1; p += 2 }
      } else one += 1
    }
    OpCounts(skip, one, two, eight)
  }

  /** All frames of an AVI whose movi list carries CRAM streams in `00dc`
    * chunks, decoded with the inter-frame carry. Same RIFF walk contract as
    * [[Multimodal.aviFrames]]/[[Multimodal.aviMjpegFrames]]. */
  def aviCramFrames(p: Array[Byte], w: Int, h: Int): Option[Seq[Array[Int]]] = {
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
        val out = ArrayBuffer.empty[Array[Int]]
        var prev: Array[Int] = null
        var j = i + 12
        val end = math.min(i + 8 + size, p.length.toLong)
        while (j + 8 <= end) {
          val ja = j.toInt
          val jsize = u32(ja + 4)
          if (j + 8 + jsize > end) return None // truncated frame chunk
          if (tag(ja, "00dc")) {
            val stream = java.util.Arrays.copyOfRange(p, ja + 8, ja + 8 + jsize.toInt)
            val frame = decodeFrame(w, h, stream, prev)
            out += frame
            prev = frame
          }
          j += 8L + jsize + (jsize & 1L)
        }
        return Some(out.toSeq)
      }
      i += 8L + size + (size & 1L)
    }
    None
  }
}
