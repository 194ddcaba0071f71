package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** MS Video 1 (CRAM): hand-computed known-value decodes pin the bit
  * conventions (bottom-up blocks, LSB-first flags, 8-color quadrants), the
  * skip op proves real inter-frame reconstruction, and formula round-trips
  * prove encode/decode are inverse on conforming content.
  */
class MsVideo1Spec extends AnyFunSuite {

  private def le(words: Int*): Array[Byte] =
    words.flatMap(w => Seq((w & 0xff).toByte, ((w >> 8) & 0xff).toByte)).toArray

  test("1-color op fills a 4x4 frame; color is the low 15 bits") {
    val f = MsVideo1.decodeFrame(4, 4, le(0x8000 | 0x1234), null)
    assert(f.forall(_ == 0x1234))
  }

  test("2-color op: LSB-first flags over bottom-up rows") {
    // flags = 1 (only bit 0 set): pixel 0 = bottom-left takes color A
    val f = MsVideo1.decodeFrame(4, 4, le(0x0001, 0x0AAA, 0x0BBB), null)
    assert(f(3 * 4 + 0) == 0x0AAA, "bit 0 is the BOTTOM-left pixel")
    assert(f.count(_ == 0x0AAA) == 1 && f.count(_ == 0x0BBB) == 15)
    // bit 14 = row 3 (top), cx 2 -> top row, third pixel
    val g = MsVideo1.decodeFrame(4, 4, le(1 << 14, 0x0AAA, 0x0BBB), null)
    assert(g(0 * 4 + 2) == 0x0AAA)
  }

  test("8-color op: per-quadrant pairs, marker bit on colorA0") {
    // flags 0 -> every pixel takes its quadrant's B color
    val f = MsVideo1.decodeFrame(4, 4,
      le(0x0000, 0x8000 | 0x7001, 0x0001, 0x7002, 0x0002,
         0x7003, 0x0003, 0x7004, 0x0004), null)
    // q0 bottom-left, q1 bottom-right, q2 top-left, q3 top-right
    assert(f(3 * 4 + 0) == 0x0001 && f(3 * 4 + 3) == 0x0002)
    assert(f(0 * 4 + 0) == 0x0003 && f(0 * 4 + 3) == 0x0004)
  }

  test("skip op copies blocks from the previous frame") {
    val prev = Array.fill(4 * 4)(0x0123)
    // whole-frame skip (1 block)
    val f = MsVideo1.decodeFrame(4, 4, le(0x8400 | 1), prev)
    assert(f.sameElements(prev))
    // 8x4 = 2 blocks: code the left block, skip the right
    val prev2 = Array.tabulate(8 * 4)(i => 0x0200 + i)
    val g = MsVideo1.decodeFrame(8, 4, le(0x8000 | 0x0111, 0x8400 | 1), prev2)
    for (y <- 0 until 4; x <- 0 until 4) assert(g(y * 8 + x) == 0x0111)
    for (y <- 0 until 4; x <- 4 until 8) assert(g(y * 8 + x) == prev2(y * 8 + x))
  }

  test("encode/decode round-trip with real skip runs on stable content") {
    val w = 16; val h = 16
    val frames = (0 until 4).map { f =>
      Array.tabulate(w * h) { k =>
        val x = k % w; val y = k / w
        val bx = x / 4; val by = y / 4
        if (bx == f % 4 && by == (2 * f) % 4)      // moving 2-color checker
          if ((x + y) % 2 == 0) 0x0AAA + f else 0x0BB0 + f
        else (bx * 5 + by * 7 + 3) % 32768          // static background
      }
    }
    val streams = MsVideo1.encodeFrames(w, h, frames)
    var prev: Array[Int] = null
    streams.zip(frames).zipWithIndex.foreach { case ((s, expect), i) =>
      val got = MsVideo1.decodeFrame(w, h, s, prev)
      assert(got.sameElements(expect), s"frame $i mismatch")
      prev = got
    }
    // inter-frame evidence: frame 0 intra (no skips), later frames skip most
    assert(MsVideo1.ops(streams(0)).skip == 0)
    (1 until 4).foreach { i =>
      val o = MsVideo1.ops(streams(i))
      assert(o.skip > 0, s"frame $i must use skip ops")
      assert(o.one + o.two + o.eight <= 4, s"frame $i codes only changed blocks")
    }
  }

  test("skip-colliding 1-color values fall back to a 2-color op") {
    val w = 4; val h = 4
    val frames = Seq(Array.fill(w * h)(0x0555)) // high byte would be 0x85
    val streams = MsVideo1.encodeFrames(w, h, frames)
    assert(MsVideo1.ops(streams(0)) == MsVideo1.OpCounts(0, 0, 1, 0))
    assert(MsVideo1.decodeFrame(w, h, streams(0), null).forall(_ == 0x0555))
  }

  test("8-color round-trip: quadrant-2-colorable block") {
    val w = 4; val h = 4
    val frame = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      val q = (y / 2) * 2 + (x / 2)
      if ((x + y) % 2 == 0) 0x1000 + q * 64 else 0x2000 + q * 64
    }
    val streams = MsVideo1.encodeFrames(w, h, Seq(frame))
    assert(MsVideo1.ops(streams(0)).eight == 1)
    assert(MsVideo1.decodeFrame(w, h, streams(0), null).sameElements(frame))
  }

  test("AVI CRAM container round-trip via the movi walk") {
    val w = 8; val h = 8
    val frames = (0 until 3).map { f =>
      Array.tabulate(w * h) { k =>
        val x = k % w; val y = k / w
        if (x / 4 == f % 2 && y / 4 == 0)
          (if ((x + y) % 2 == 0) 0x0A00 + f else 0x0B00 + f)
        else 0x0300 + (x / 4) * 3 + (y / 4) * 5
      }
    }
    val avi = Multimodal.synthAviCompressed(w, h,
      MsVideo1.encodeFrames(w, h, frames))
    val got = MsVideo1.aviCramFrames(avi, w, h)
      .getOrElse(fail("AVI CRAM walk failed"))
    assert(got.size == 3)
    got.zip(frames).foreach { case (g, e) => assert(g.sameElements(e)) }
  }
}
