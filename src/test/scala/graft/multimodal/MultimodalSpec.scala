package graft.multimodal

import graft.SparkSpec

/** Binary-column plumbing with batched stub decode. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "Az picture bytes here"),
    (2L, ""),
    (3L, "x")
  ).toDF("doc_id", "text")

  test("headerDims parses real PNG and GIF headers, rejects others") {
    // hand-built PNG: magic + IHDR length/type + width=640 height=480 (BE)
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0).map(_.toByte)
    assert(Multimodal.headerDims(png).contains((640, 480)))
    // GIF89a with width=320 height=200 (LE u16)
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0xc8, 0x00).map(_.toByte))
    assert(Multimodal.headerDims(gif).contains((320, 200)))
    assert(Multimodal.headerDims("not an image".getBytes).isEmpty)
    assert(Multimodal.headerDims(Array.empty[Byte]).isEmpty)
    // the decode path surfaces the REAL dims, not the stub fallback
    val ds = Seq(Multimodal.MediaRecord(9L, "image", png)).toDS()
    val f = Multimodal.extractFeatures(ds).head()
    assert((f.width, f.height) == (640, 480))
  }

  test("headerDims walks JPEG markers to the SOF frame header") {
    def jpeg(sofMarker: Int): Array[Byte] = Array[Int](
      0xff, 0xd8,                                     // SOI
      0xff, 0xe0, 0x00, 0x10,                         // APP0, len 16
      'J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xdb, 0x00, 0x04, 0x00, 0x01,             // DQT, len 4
      0xff, 0xff,                                     // legal fill byte
      0xff, sofMarker, 0x00, 0x11,                    // SOFn, len 17
      0x08,                                           // precision
      0x01, 0xe0,                                     // height 480 (BE)
      0x02, 0x80,                                     // width 640 (BE)
      0x03, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1        // 3 components
    ).map(_.toByte)
    // baseline (SOF0) and progressive (SOF2) share the frame-header layout
    assert(Multimodal.headerDims(jpeg(0xc0)).contains((640, 480)))
    assert(Multimodal.headerDims(jpeg(0xc2)).contains((640, 480)))
    // C4 is DHT, not a SOF: its segment must be skipped, not parsed as dims;
    // with no SOF before the stream ends the walk reports no dims
    val dhtOnly = Array[Int](0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0x00, 0x01)
      .map(_.toByte)
    assert(Multimodal.headerDims(dhtOnly).isEmpty)
    // SOS before any SOF (corrupt): no dims rather than garbage
    val sosFirst = Array[Int](0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0)
      .map(_.toByte)
    assert(Multimodal.headerDims(sosFirst).isEmpty)
    // truncated mid-SOF: no dims
    assert(Multimodal.headerDims(jpeg(0xc0).take(30)).isEmpty)
    // the decode path surfaces the walked dims
    val ds = Seq(Multimodal.MediaRecord(7L, "image", jpeg(0xc2))).toDS()
    val f = Multimodal.extractFeatures(ds).head()
    assert((f.width, f.height) == (640, 480))
  }

  test("wavHeader walks RIFF chunks to fmt and data") {
    def u16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def u32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def tag(s: String) = s.getBytes("US-ASCII").map(_.toInt).toSeq
    // 2ch / 44100 Hz / 16-bit, one LIST chunk before fmt, 400-byte data
    val wav = (tag("RIFF") ++ u32(1000) ++ tag("WAVE") ++
      tag("LIST") ++ u32(4) ++ Seq(1, 2, 3, 4) ++
      tag("fmt ") ++ u32(16) ++ u16(1) ++ u16(2) ++ u32(44100) ++
        u32(44100 * 4) ++ u16(4) ++ u16(16) ++
      tag("data") ++ u32(400) ++ Seq.fill(400)(0)
    ).map(_.toByte).toArray
    assert(Multimodal.wavHeader(wav)
      .contains(Multimodal.WavInfo(2, 44100, 16, 100))) // 400 bytes / 4 align
    // truncated right after the full fmt chunk (48 bytes): metadata known,
    // frame count unknown; a cut INSIDE fmt (44 bytes) yields nothing
    assert(Multimodal.wavHeader(wav.take(48))
      .contains(Multimodal.WavInfo(2, 44100, 16, -1)))
    assert(Multimodal.wavHeader(wav.take(44)).isEmpty)
    assert(Multimodal.wavHeader("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(Multimodal.wavHeader(Array.empty[Byte]).isEmpty)
  }

  test("mp4Header walks boxes to moov/mvhd for both mvhd versions") {
    def u32(v: Long) = Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    def u64(v: Long) = u32(v >> 32) ++ u32(v & 0xffffffffL)
    def tag(s: String) = s.getBytes("US-ASCII").map(_.toInt & 0xffL).toSeq
    def box(t: String, payload: Seq[Long]): Seq[Long] =
      u32(8L + payload.size) ++ tag(t) ++ payload
    val ftyp = box("ftyp", tag("isom") ++ u32(512) ++ tag("isom"))
    // v0 mvhd: ver+flags, ctime, mtime, timescale 600, duration 36000 (60 s)
    val mvhd0 = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(36000)
      ++ Seq.fill(80)(0L))
    val free = box("free", Seq.fill(6)(0L))
    val mp4v0 = (ftyp ++ box("moov", free ++ mvhd0)).map(_.toByte).toArray
    assert(Multimodal.mp4Header(mp4v0)
      .contains(Multimodal.Mp4Info(600, 36000)))
    // v1 mvhd: u64 times, timescale 90000, u64 duration
    val mvhd1 = box("mvhd", u32(0x01000000L) ++ u64(0) ++ u64(0) ++ u32(90000)
      ++ u64(4500000L) ++ Seq.fill(80)(0L))
    val mp4v1 = (ftyp ++ box("moov", mvhd1)).map(_.toByte).toArray
    assert(Multimodal.mp4Header(mp4v1)
      .contains(Multimodal.Mp4Info(90000, 4500000L)))
    // no moov, wrong magic, truncated mid-mvhd: all None, never a throw
    assert(Multimodal.mp4Header((ftyp ++ free).map(_.toByte).toArray).isEmpty)
    assert(Multimodal.mp4Header("not a video".getBytes).isEmpty)
    assert(Multimodal.mp4Header(mp4v0.take(40)).isEmpty)
  }

  test("header parses are total on random and truncated byte streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val byteGen: Gen[Array[Byte]] = for {
      n <- Gen.choose(0, 64)
      prefix <- Gen.oneOf(
        Seq[Byte](),                                 // arbitrary garbage
        Seq(0xff.toByte, 0xd8.toByte),               // valid SOI then garbage
        Seq(0xff.toByte, 0xd8.toByte, 0xff.toByte),  // dangling marker
        "GIF89a".getBytes("US-ASCII").toSeq,         // GIF magic then garbage
        Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte), // partial PNG
        ("RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
          "WAVE".getBytes("US-ASCII")).toSeq,        // WAV magic then garbage
        (Array[Byte](0, 0, 0, 16) ++ "ftyp".getBytes("US-ASCII")).toSeq,
        (Array[Byte](0, 0, 0, 1) ++ "moov".getBytes("US-ASCII")).toSeq)
          // MP4 leads incl. a largesize-flagged box
      rest <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield (prefix ++ rest).toArray
    (0 until 20000).foreach { i =>
      val bytes = sample(byteGen, i.toLong)
      // must return (not throw) on every input; JPEG/GIF dims are u16-bounded
      Multimodal.headerDims(bytes).foreach { case (w, h) =>
        assert(w >= 0 && h >= 0)
      }
      Multimodal.wavHeader(bytes).foreach { info =>
        assert(info.channels >= 0 && info.sampleRate >= 0)
      }
      Multimodal.mp4Header(bytes).foreach { info =>
        assert(info.timescale >= 0 && info.duration >= 0)
      }
    }
  }

  test("PNG encode/decode round-trips pixels exactly across all filter types") {
    // encodePng cycles filters 0-4 by row, so any grid with height ≥ 5
    // exercises None, Sub, Up, Average AND Paeth reconstruction
    val rnd = new scala.util.Random(42)
    for ((w, h, ch) <- Seq((1, 1, 1), (3, 7, 1), (16, 10, 3), (5, 6, 4), (24, 15, 2))) {
      val px = Array.fill(w * h * ch)(rnd.nextInt(256))
      val bytes = Multimodal.encodePng(w, h, ch, px)
      assert(Multimodal.headerDims(bytes).contains((w, h)), "IHDR dims")
      val img = Multimodal.decodePng(bytes)
        .getOrElse(fail(s"decode failed at ${(w, h, ch)}"))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.pixels.sameElements(px), s"pixels differ at ${(w, h, ch)}")
    }
  }

  test("decodePng is total: corrupt, truncated and random streams return None") {
    val good = Multimodal.encodePng(8, 6, 3, Array.fill(8 * 6 * 3)(7))
    assert(Multimodal.decodePng(good).isDefined)
    assert(Multimodal.decodePng(good.take(40)).isEmpty) // truncated in IDAT
    assert(Multimodal.decodePng(Array[Byte](1, 2, 3)).isEmpty)
    val corrupt = good.clone() // flip a byte in the deflate stream: no throw
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x55).toByte
    Multimodal.decodePng(corrupt)
    val rnd = new scala.util.Random(7)
    (0 until 2000).foreach { _ =>
      Multimodal.decodePng(Array.fill(rnd.nextInt(128))(rnd.nextInt().toByte))
    }
  }

  test("wavSamples decodes s16le and u8 PCM exactly; declines codec depths") {
    val s16 = Array(-32768, -1, 0, 1, 32767, 1234, -1234)
    assert(Multimodal.wavSamples(
      Multimodal.synthWavPcm(1, 8000, 16, s16)).get.sameElements(s16))
    val s8 = Array(-128, -1, 0, 1, 127)
    assert(Multimodal.wavSamples(
      Multimodal.synthWavPcm(1, 8000, 8, s8)).get.sameElements(s8))
    // stereo interleave preserved in container order
    val st = Array(10, -10, 20, -20)
    assert(Multimodal.wavSamples(
      Multimodal.synthWavPcm(2, 44100, 16, st)).get.sameElements(st))
    // 24-bit: header still parses, sample decode declines (codec territory)
    val b24 = Multimodal.synthWav(1, 8000, 24, 4)
    assert(Multimodal.wavHeader(b24).isDefined)
    assert(Multimodal.wavSamples(b24).isEmpty)
  }

  test("AVI: header + raw frames round-trip; compressed/odd-size/corrupt handled") {
    // 5x3 gray, 3 frames with distinct content; 15 bytes per frame (ODD →
    // exercises the RIFF pad-byte rule on every chunk)
    val frames = (0 until 3).map(f =>
      Array.tabulate(15)(k => (f * 40 + k).toByte))
    val avi = Multimodal.synthAvi(5, 3, frames)
    assert(Multimodal.aviHeader(avi).contains(Multimodal.AviInfo(5, 3, 3)))
    val got = Multimodal.aviFrames(avi).get
    assert(got.length == 3)
    got.zip(frames).foreach { case (g, f) => assert(g.sameElements(f)) }
    // a compressed '00dc' stream declines (codec territory), no throw
    val dc = avi.clone()
    val idx = avi.indexOfSlice("00db".getBytes("US-ASCII"))
    dc(idx + 3) = 'c'.toByte
    assert(Multimodal.aviFrames(dc).isEmpty)
    // truncation + garbage are total
    assert(Multimodal.aviFrames(avi.take(30)).isEmpty)
    assert(Multimodal.aviHeader("not an avi".getBytes).isEmpty)
    val rnd = new scala.util.Random(11)
    (0 until 2000).foreach { _ =>
      val b = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      Multimodal.aviHeader(b); Multimodal.aviFrames(b)
    }
  }

  test("payloadFrom wraps text as binary with kind") {
    val ds = Multimodal.payloadFrom(docs, "doc_id", "text", kind = "image")
    val r = ds.collect().sortBy(_.id)
    assert(r.map(_.kind).toSet == Set("image"))
    assert(new String(r(0).payload, "UTF-8") == "Az picture bytes here")
    assert(r(1).payload.length == 0)
  }

  test("extractFeatures: deterministic stub dims + sha + byte count") {
    val got = Multimodal.extractFeatures(
        Multimodal.payloadFrom(docs, "doc_id", "text"), batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    assert(got(1L).n_bytes == 21)
    assert(got(1L).width == 1 + ('A' & 0x7f) % 64)
    assert(got(1L).height == 1 + ('z' & 0x7f) % 64)
    assert(got(1L).sha.length == 64)
    assert(got(2L).n_bytes == 0 && got(2L).width == 0 && got(2L).height == 0)
    assert(got(3L).width == 1 + ('x' & 0x7f) % 64 && got(3L).height == 0)
    // empty payload sha must still be the sha256 of empty input
    assert(got(2L).sha ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("resizeStub: deterministic subsample to target byte budget") {
    val ds = Multimodal.payloadFrom(
      Seq((1L, "x" * 1000), (2L, "y" * 10)).toDF("doc_id", "text"), "doc_id", "text")
    val resized = Multimodal.resizeStub(ds, targetW = 8, targetH = 8)
      .collect().map(r => r.id -> r.payload).toMap
    assert(resized(1L).length == 64)          // shrunk to targetW*targetH
    assert(resized(2L).length == 10)          // already below budget: untouched
    val again = Multimodal.resizeStub(ds, 8, 8)
      .collect().map(r => r.id -> r.payload).toMap
    assert(resized(1L).sameElements(again(1L))) // deterministic
  }

  test("GIF: LZW encode/decode round-trips indices exactly, both interlace modes") {
    val palette = Array.tabulate(16)(i => (i * 17 << 16) | (i * 7 << 8) | i)
    for (w <- Seq(1, 3, 7, 16); h <- Seq(1, 2, 5, 9); inter <- Seq(false, true)) {
      val idx = Array.tabulate(w * h)(k => ((k * 31 + 7) % 16).toByte)
      val bytes = Multimodal.synthGif(w, h, idx, palette, inter)
      val img = Multimodal.decodeGif(bytes)
        .getOrElse(fail(s"decode failed w=$w h=$h inter=$inter"))
      assert(img.width == w && img.height == h && img.interlaced == inter)
      assert(img.indices.toSeq == idx.toSeq, s"pixels differ w=$w h=$h inter=$inter")
      assert(img.palette.toSeq == palette.toSeq)
    }
  }

  test("GIF: large 256-color random image exercises code-width growth + KwKwK") {
    val rnd = new scala.util.Random(42)
    val palette = Array.tabulate(256)(i => i << 16 | i << 8 | i)
    // random bytes: dictionary grows past 512/1024 entries → width 9,10,11;
    // runs of repeats trigger the KwKwK case
    val idx = Array.tabulate(64 * 64) { k =>
      if (k % 17 < 5) 7.toByte else rnd.nextInt(256).toByte
    }
    val bytes = Multimodal.synthGif(64, 64, idx, palette)
    val img = Multimodal.decodeGif(bytes).getOrElse(fail("decode failed"))
    assert(img.indices.toSeq == idx.toSeq)
    // a REPETITIVE image must genuinely compress (real LZW, not literal
    // passthrough): 4096 px of period-8 stripes → long dictionary matches
    val stripes = Array.tabulate(64 * 64)(k => ((k / 8) % 4).toByte)
    val packed = Multimodal.synthGif(64, 64, stripes, palette)
    assert(packed.length < 64 * 64 / 2,
      s"stripes didn't compress: ${packed.length} bytes for 4096 px")
    assert(Multimodal.decodeGif(packed).get.indices.toSeq == stripes.toSeq)
  }

  test("GIF: table-full reset path survives a >4096-entry stream") {
    val palette = Array.tabulate(256)(i => i)
    // 160×160 high-entropy image: dictionary hits 4096 and resets mid-stream
    val rnd = new scala.util.Random(7)
    val idx = Array.fill(160 * 160)(rnd.nextInt(256).toByte)
    val img = Multimodal.decodeGif(Multimodal.synthGif(160, 160, idx, palette))
      .getOrElse(fail("decode failed after table reset"))
    assert(img.indices.toSeq == idx.toSeq)
  }

  test("decodeGif is total: corrupt, truncated and foreign streams return None") {
    val palette = Array.tabulate(4)(i => i * 60)
    val good = Multimodal.synthGif(5, 4, Array.fill(20)(2.toByte), palette)
    assert(Multimodal.decodeGif(good).isDefined)
    for (cut <- Seq(0, 5, 12, good.length / 2, good.length - 2))
      assert(Multimodal.decodeGif(good.take(cut)).isEmpty, s"cut=$cut")
    assert(Multimodal.decodeGif("notagif".getBytes).isEmpty)
    assert(Multimodal.decodeGif(Multimodal.synthPng(3, 3)).isEmpty)
    val rnd = new scala.util.Random(3)
    (0 until 50).foreach { _ =>
      val junk = "GIF89a".getBytes ++ Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Multimodal.decodeGif(junk) // must not throw
    }
  }

  test("sampleFrames: stride chunks with stable hashes") {
    val ds = Multimodal.payloadFrom(
      Seq((7L, "a" * 600)).toDF("doc_id", "text"), "doc_id", "text", "video")
    val frames = Multimodal.sampleFrames(ds, stride = 256)
      .as[(Long, Int, Int)].collect().sortBy(_._2)
    assert(frames.length == 3) // 256+256+88
    assert(frames.map(_._1).toSet == Set(7L))
    // first two frames identical bytes → identical hash; last differs
    assert(frames(0)._3 == frames(1)._3)
    assert(frames(2)._3 != frames(0)._3)
  }
}
