package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Clean-room baseline JPEG codec: entropy-layer losslessness, IDCT
  * cross-checks (separable vs naive direct sum, and closed-form DC), an
  * INDEPENDENT decoder oracle (the JDK's ImageIO baseline JPEG reader,
  * which ships offline), restart-marker resync, and the MJPEG AVI walk. */
class JpegSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** Random quantized coefficient block in zigzag order: sparse AC with
    * occasional long zero runs (forces ZRL), categories up to 10. */
  private def randomBlockZig(r: scala.util.Random): Array[Int] = {
    val blk = new Array[Int](64)
    blk(0) = r.nextInt(2001) - 1000 // DC well inside category 11 as a DIFF too
    var k = 1
    while (k < 64) {
      if (r.nextInt(5) == 0) blk(k) = r.nextInt(1023) - 511 // cat <= 10
      k += 1 + r.nextInt(8) // gaps up to 7; multiple gaps compose ZRL runs
    }
    blk
  }

  test("zigzag table is the spec permutation (spot anchors + bijection)") {
    val z = Jpeg.ZigZag
    assert(z.toSet == (0 until 64).toSet, "must be a permutation")
    // anchors from T.81 Figure 5
    assert(z.take(10).toSeq == Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(z(63) == 63)
  }

  test("entropy layer is lossless: coeffs round-trip bit-for-bit") {
    val r = rng(42)
    for (trial <- 0 until 20) {
      val w = 1 + r.nextInt(40)
      val h = 1 + r.nextInt(30)
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val quant = Array.tabulate(64)(k => 1 + (k * 7 + trial) % 40)
      val blocks = Array.fill(bw * bh)(randomBlockZig(r))
      val ri = if (trial % 3 == 0) 1 + r.nextInt(4) else 0
      val bytes = Jpeg.encodeJpegFromCoeffs(w, h, quant, blocks, ri)
      val got = Jpeg.jpegQuantizedCoeffs(bytes)
        .getOrElse(fail(s"decode failed, trial $trial"))
      assert(got.width == w && got.height == h && got.components == 1)
      val c0 = got.comps(0)
      assert(c0.blocksWide == bw && c0.blocksHigh == bh)
      // quant table de-zigzagged to natural order
      for (k <- 0 until 64)
        assert(c0.quant(Jpeg.ZigZag(k)) == quant(k))
      // every block, every coefficient, through the natural-order mapping
      for (b <- blocks.indices; k <- 0 until 64)
        assert(c0.blocks(b)(Jpeg.ZigZag(k)) == blocks(b)(k),
          s"trial $trial block $b zigzag-k $k")
    }
  }

  test("separable IDCT agrees with the naive direct-sum reference") {
    val r = rng(7)
    for (_ <- 0 until 50) {
      val in = Array.fill(64)((r.nextInt(2047) - 1023).toDouble)
      val fast = {
        // decode a single-block image whose quant table is all ones and
        // whose coefficients are `in` — exercises the production path
        val zig = Array.tabulate(64)(k => math.round(in(Jpeg.ZigZag(k))).toInt)
        val capped = zig.map(v => math.max(-511, math.min(511, v)))
        val bytes = Jpeg.encodeJpegFromCoeffs(8, 8, Array.fill(64)(1), Array(capped))
        Jpeg.decodeJpeg(bytes).get.planes(0)
      }
      val direct = {
        val nat = new Array[Double](64)
        val zig = Array.tabulate(64)(k => math.round(in(Jpeg.ZigZag(k))).toInt)
        val capped = zig.map(v => math.max(-511, math.min(511, v)))
        for (k <- 0 until 64) nat(Jpeg.ZigZag(k)) = capped(k).toDouble
        Jpeg.idctDirect(nat).map(v =>
          math.max(0, math.min(255, math.round(v).toInt + 128)))
      }
      for (i <- 0 until 64)
        assert(math.abs(fast(i) - direct(i)) <= 1,
          s"pixel $i: separable ${fast(i)} vs direct ${direct(i)}")
    }
  }

  test("DC-only blocks decode to the exact closed form clamp(dc*q/8 + 128)") {
    // q0 = 8 makes dc*q0/8 integral — zero float ambiguity, the same
    // arithmetic the q_jpeg_decode DuckDB oracle replays
    val quant = Array.fill(64)(16); quant(0) = 8
    val dcs = Seq(-300, -190, -64, -1, 0, 1, 63, 127, 200)
    val blocks = dcs.map { dc =>
      val b = new Array[Int](64); b(0) = dc; b
    }.toArray
    val w = 8 * blocks.length; val h = 8
    val img = Jpeg.decodeJpeg(
      Jpeg.encodeJpegFromCoeffs(w, h, quant, blocks)).get
    for ((dc, bi) <- dcs.zipWithIndex; yy <- 0 until 8; xx <- 0 until 8) {
      val expect = math.max(0, math.min(255, dc + 128))
      val got = img.planes(0)(yy * w + bi * 8 + xx)
      assert(got == expect, s"dc=$dc pixel ($xx,$yy)")
    }
  }

  test("ImageIO (independent JDK decoder) agrees on our encoder's output") {
    val r = rng(99)
    for (trial <- 0 until 5) {
      val w = 13 + r.nextInt(30)
      val h = 9 + r.nextInt(20)
      val px = Array.tabulate(w * h)(i => (i * 37 + trial * 101) % 256)
      val quant = Array.tabulate(64)(k => 1 + k % 11)
      val ri = if (trial % 2 == 0) 3 else 0
      val bytes = Jpeg.encodeJpegGray(w, h, px, quant, ri)
      val ours = Jpeg.decodeJpeg(bytes).getOrElse(fail("own decode failed"))
      val theirs = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(theirs != null, "ImageIO rejected the stream")
      assert(theirs.getWidth == w && theirs.getHeight == h)
      val raster = theirs.getRaster
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(raster.getSample(x, y, 0) - ours.planes(0)(y * w + x))
        maxDiff = math.max(maxDiff, d)
      }
      // float IDCT vs libjpeg-style integer IDCT: ±1 in practice
      assert(maxDiff <= 2, s"trial $trial: max pixel diff $maxDiff")
    }
  }

  test("encodeJpegGray round-trips pixels within quantization error") {
    val r = rng(5)
    val w = 23; val h = 17
    // smooth-ish field keeps high-frequency quant error small
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      128 + (40 * math.sin(x / 4.0) + 30 * math.cos(y / 3.0)).toInt
    }
    val img = Jpeg.decodeJpeg(Jpeg.encodeJpegGray(w, h, px, Array.fill(64)(1))).get
    val maxErr = px.indices.map(i => math.abs(img.planes(0)(i) - px(i))).max
    assert(maxErr <= 3, s"max pixel error $maxErr with unit quant")
  }

  test("restart markers resync and reset the DC predictor") {
    val quant = Array.fill(64)(16); quant(0) = 8
    // 10 blocks, restart every 2 — predictor chain broken 4 times; values
    // chosen so a missed reset shifts every post-restart pixel
    val dcs = Array.tabulate(10)(b => 100 - 23 * b)
    val blocks = dcs.map { dc => val b = new Array[Int](64); b(0) = dc; b }
    val bytes = Jpeg.encodeJpegFromCoeffs(80, 8, quant, blocks, restartInterval = 2)
    // the stream really contains RST markers
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "no RST marker emitted")
    val img = Jpeg.decodeJpeg(bytes).get
    for ((dc, bi) <- dcs.zipWithIndex)
      assert(img.planes(0)(bi * 8) == math.max(0, math.min(255, dc + 128)),
        s"block $bi dc=$dc")
  }

  test("decoder is total on malformed input") {
    assert(Jpeg.decodeJpeg(Array.empty[Byte]).isEmpty)
    assert(Jpeg.decodeJpeg("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decodeJpeg(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    val good = Jpeg.encodeJpegFromCoeffs(8, 8, Array.fill(64)(1),
      Array(Array.fill(64)(0)))
    // every truncation inside the entropy data must fail cleanly, never
    // throw; dropping only the trailing EOI may still decode (the scan is
    // complete) — the spec-legal leniency every mainstream decoder shares
    for (cut <- 0 until good.length - 2)
      assert(Jpeg.decodeJpeg(good.take(cut)).isEmpty, s"cut at $cut")
    // bit flips must either decode or fail cleanly (no throw)
    val r = rng(3)
    for (_ <- 0 until 200) {
      val mutated = good.clone()
      val at = r.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << r.nextInt(8))).toByte
      Jpeg.decodeJpeg(mutated) // must not throw
    }
  }

  test("4:2:0 entropy layer is lossless across the MCU interleave") {
    val r = rng(11)
    for (trial <- 0 until 10) {
      val w = 1 + r.nextInt(40)
      val h = 1 + r.nextInt(30)
      val mcuW = (w + 15) / 16; val mcuH = (h + 15) / 16
      val qY = Array.tabulate(64)(k => 1 + (k + trial) % 30)
      val qC = Array.tabulate(64)(k => 1 + (k * 5 + trial) % 30)
      val y = Array.fill(mcuW * 2 * mcuH * 2)(randomBlockZig(r))
      val cb = Array.fill(mcuW * mcuH)(randomBlockZig(r))
      val cr = Array.fill(mcuW * mcuH)(randomBlockZig(r))
      val ri = if (trial % 2 == 0) 1 + r.nextInt(3) else 0
      val bytes = Jpeg.encodeJpegMulti(w, h, Seq(
        Jpeg.EncComp(2, 2, qY, y), Jpeg.EncComp(1, 1, qC, cb),
        Jpeg.EncComp(1, 1, qC, cr)), ri)
      val got = Jpeg.jpegQuantizedCoeffs(bytes)
        .getOrElse(fail(s"420 decode failed, trial $trial"))
      assert(got.components == 3)
      assert((got.comps(0).h, got.comps(0).v) == (2, 2))
      assert((got.comps(1).h, got.comps(1).v) == (1, 1))
      assert(got.comps(0).blocksWide == mcuW * 2 &&
        got.comps(0).blocksHigh == mcuH * 2)
      assert(got.comps(1).blocksWide == mcuW && got.comps(1).blocksHigh == mcuH)
      for ((enc, ci) <- Seq(y, cb, cr).zipWithIndex;
           b <- enc.indices; k <- 0 until 64)
        assert(got.comps(ci).blocks(b)(Jpeg.ZigZag(k)) == enc(b)(k),
          s"trial $trial comp $ci block $b zigzag-k $k")
    }
  }

  test("4:2:0 DC-only decode: exact closed form incl. chroma upsampling") {
    // w=20, h=12 → 2x1 MCUs; luma grid 4x2 blocks, chroma 2x1
    val w = 20; val h = 12
    val quant = Array.fill(64)(16); quant(0) = 8
    def dcBlock(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val yDc = Array.tabulate(8)(b => 10 * b - 30)     // luma 4x2 raster
    val cbDc = Array(40, -60)                          // chroma 2x1 raster
    val crDc = Array(-100, 90)
    val bytes = Jpeg.encodeJpegMulti(w, h, Seq(
      Jpeg.EncComp(2, 2, quant, yDc.map(dcBlock)),
      Jpeg.EncComp(1, 1, quant, cbDc.map(dcBlock)),
      Jpeg.EncComp(1, 1, quant, crDc.map(dcBlock))), restartInterval = 1)
    val img = Jpeg.decodeJpeg(bytes).getOrElse(fail("420 decode failed"))
    assert(img.components == 3 && img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      // luma: block (x/8, y/8) in the 4-wide grid
      val yb = (y / 8) * 4 + (x / 8)
      assert(img.planes(0)(y * w + x) == yDc(yb) + 128, s"luma ($x,$y)")
      // chroma: comp res 10x6 (one block row), block = (x/2)/8; pixel
      // replication upsample means full-res (x,y) → comp (x/2, y/2)
      val cbBlk = (x / 2) / 8
      assert(img.planes(1)(y * w + x) == cbDc(cbBlk) + 128, s"cb ($x,$y)")
      assert(img.planes(2)(y * w + x) == crDc(cbBlk) + 128, s"cr ($x,$y)")
    }
  }

  test("ImageIO agrees on 4:2:0 color output (smooth chroma)") {
    val w = 36; val h = 24
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    // smooth luma, CONSTANT chroma per half-plane so ImageIO's fancy
    // (triangular) chroma upsampling and our replication agree exactly
    val y = Array.tabulate(w * h) { i =>
      val x = i % w; val yy = i / w
      128 + (60 * math.sin(x / 5.0) * math.cos(yy / 4.0)).toInt
    }
    val cb = Array.fill(cw * ch)(90)
    val cr = Array.fill(cw * ch)(170)
    val bytes = Jpeg.encodeJpegYcbcr420(w, h, y, cb, cr,
      Array.fill(64)(1), Array.fill(64)(1))
    val ours = Jpeg.decodeJpeg(bytes).getOrElse(fail("own decode failed"))
    val rgb = Jpeg.ycbcrToRgb(ours)
    val theirs = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO rejected the 4:2:0 stream")
    assert(theirs.getWidth == w && theirs.getHeight == h)
    var maxDiff = 0
    for (py <- 0 until h; px <- 0 until w) {
      val t = theirs.getRGB(px, py)
      val o = rgb(py * w + px)
      for (shift <- Seq(16, 8, 0))
        maxDiff = math.max(maxDiff,
          math.abs(((t >> shift) & 0xff) - ((o >> shift) & 0xff)))
    }
    // float vs libjpeg integer IDCT + integer color convert: small slack
    assert(maxDiff <= 3, s"max RGB channel diff $maxDiff")
  }

  test("progressive entropy layer is lossless (spectral + successive approx)") {
    val r = rng(21)
    for (trial <- 0 until 15) {
      val w = 1 + r.nextInt(40)
      val h = 1 + r.nextInt(30)
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      val nc = 1 + (trial % 3) // 1, 2, 3 components
      val comps = (0 until nc).map { ci =>
        Jpeg.EncComp(1, 1,
          Array.tabulate(64)(k => 1 + (k * 3 + ci + trial) % 40),
          Array.fill(bw * bh)(randomBlockZig(r)))
      }
      val bytes = Jpeg.encodeJpegProgressive(w, h, comps)
      // stream really is SOF2
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "no SOF2 marker")
      val got = Jpeg.jpegQuantizedCoeffs(bytes)
        .getOrElse(fail(s"progressive decode failed, trial $trial"))
      assert(got.components == nc)
      for (ci <- 0 until nc; b <- 0 until bw * bh; k <- 0 until 64)
        assert(got.comps(ci).blocks(b)(Jpeg.ZigZag(k)) == comps(ci).blocksZig(b)(k),
          s"trial $trial comp $ci block $b zigzag-k $k")
    }
  }

  test("progressive and baseline decode identical pixels from the same coeffs") {
    val r = rng(33)
    val w = 37; val h = 21
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val quant = Array.tabulate(64)(k => 1 + k % 17)
    val blocks = Array.fill(bw * bh)(randomBlockZig(r))
    val base = Jpeg.decodeJpeg(
      Jpeg.encodeJpegFromCoeffs(w, h, quant, blocks)).get
    val prog = Jpeg.decodeJpeg(
      Jpeg.encodeJpegProgressive(w, h,
        Seq(Jpeg.EncComp(1, 1, quant, blocks)))).get
    assert(base.planes(0).sameElements(prog.planes(0)),
      "progressive pixels must equal baseline pixels bit-for-bit")
  }

  test("ImageIO agrees on progressive output") {
    val r = rng(55)
    val w = 29; val h = 19
    val px = Array.tabulate(w * h)(i => (i * 41 + 7) % 256)
    // route pixels through the baseline encoder's fDCT+quant, then re-emit
    // the same quantized coefficients progressively
    val quant = Array.tabulate(64)(k => 1 + k % 7)
    val baseBytes = Jpeg.encodeJpegGray(w, h, px, quant)
    val coeffs = Jpeg.jpegQuantizedCoeffs(baseBytes).get
    val blocksZig = coeffs.comps(0).blocks.map { nat =>
      Array.tabulate(64)(k => nat(Jpeg.ZigZag(k)))
    }
    val progBytes = Jpeg.encodeJpegProgressive(w, h,
      Seq(Jpeg.EncComp(1, 1, quant, blocksZig)))
    val ours = Jpeg.decodeJpeg(progBytes).getOrElse(fail("own decode failed"))
    val theirs = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(progBytes))
    assert(theirs != null, "ImageIO rejected the progressive stream")
    assert(theirs.getWidth == w && theirs.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff, math.abs(
        theirs.getRaster.getSample(x, y, 0) - ours.planes(0)(y * w + x)))
    assert(maxDiff <= 2, s"max pixel diff $maxDiff")
  }

  test("progressive stream with its DQT corrupted away returns None, not NPE") {
    // one flipped marker byte turns 0xFFDB into a skippable APPn segment,
    // leaving quant(tq) null at EOI — must hit the 'missing quant table'
    // bail, not a NullPointerException past the ParseBail handler
    val good = Jpeg.encodeJpegProgressive(16, 16, Seq(
      Jpeg.EncComp(1, 1, Array.fill(64)(2), Array.fill(4)({
        val b = new Array[Int](64); b(0) = 19; b(3) = 5; b
      }))))
    val dqtAt = good.indices.dropRight(1).find(k =>
      (good(k) & 0xff) == 0xff && (good(k + 1) & 0xff) == 0xdb)
      .getOrElse(fail("no DQT marker in fixture"))
    val noDqt = good.clone()
    noDqt(dqtAt + 1) = 0xe9.toByte // APP9: skipped by length like DQT
    assert(Jpeg.decodeJpeg(noDqt).isEmpty)
    assert(Jpeg.jpegQuantizedCoeffs(noDqt).isEmpty)
  }

  test("progressive decoder is total on malformed input") {
    val good = Jpeg.encodeJpegProgressive(16, 16, Seq(
      Jpeg.EncComp(1, 1, Array.fill(64)(1), Array.fill(4)({
        val b = new Array[Int](64); b(0) = 37; b(9) = -4; b
      }))))
    val r = rng(13)
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      val at = r.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << r.nextInt(8))).toByte
      Jpeg.decodeJpeg(mutated) // must not throw
    }
    for (cut <- 0 until good.length)
      Jpeg.decodeJpeg(good.take(cut)) // must not throw
  }

  test("MJPEG AVI: 00dc chunks decode through the JPEG path") {
    val quant = Array.fill(64)(16); quant(0) = 8
    val w = 16; val h = 8
    val frames = (0 until 3).map { f =>
      val blocks = Array.tabulate(2) { b =>
        val blk = new Array[Int](64); blk(0) = 10 * f + b; blk
      }
      Jpeg.encodeJpegFromCoeffs(w, h, quant, blocks)
    }
    val avi = Multimodal.synthAviMjpeg(w, h, frames)
    // container-level metadata still parses
    assert(Multimodal.aviHeader(avi).contains(Multimodal.AviInfo(w, h, 3)))
    // the uncompressed walk correctly refuses the compressed stream
    assert(Multimodal.aviFrames(avi).isEmpty)
    val imgs = Multimodal.aviMjpegFrames(avi).getOrElse(fail("MJPEG walk failed"))
    assert(imgs.length == 3)
    for ((img, f) <- imgs.zipWithIndex) {
      assert(img.width == w && img.height == h)
      assert(img.planes(0)(0) == 128 + 10 * f)      // block 0 dc
      assert(img.planes(0)(8) == 128 + 10 * f + 1)  // block 1 dc
    }
  }
}
