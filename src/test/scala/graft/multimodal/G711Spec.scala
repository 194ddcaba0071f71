package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ITU-T G.711 companded-audio expansion — pinned against the published
  * reference values of the classic public-domain g711.c tables, plus
  * segment-boundary and container-walk laws. */
class G711Spec extends AnyFunSuite {
  import Multimodal.{g711ToLinear, synthWavG711, wavSamplesG711, wavHeader}

  test("mu-law reference values (g711.c ulaw2linear)") {
    // code 0xFF is +0, 0x7F is -0, 0x00 is the negative extreme -32124,
    // 0x80 the positive extreme +32124
    assert(g711ToLinear(0xff, aLaw = false) === 0)
    assert(g711ToLinear(0x7f, aLaw = false) === 0)
    assert(g711ToLinear(0x00, aLaw = false) === -32124)
    assert(g711ToLinear(0x80, aLaw = false) === 32124)
    // one value per segment, positive half: exp steps double the step size
    assert(g711ToLinear(0xfe, aLaw = false) === 8)     // mant 1, seg 0
    assert(g711ToLinear(0xf0, aLaw = false) === 120)   // mant 15, seg 0
    assert(g711ToLinear(0xef, aLaw = false) === 132)   // seg 1 starts at 132
    assert(g711ToLinear(0x8f, aLaw = false) === 16764) // seg 7 low end
  }

  test("A-law reference values (g711.c alaw2linear)") {
    // 0x55 -> -8 and 0xD5 -> +8 (the quiet codes); 0x2A / 0xAA the extremes
    assert(g711ToLinear(0x55, aLaw = true) === -8)
    assert(g711ToLinear(0xd5, aLaw = true) === 8)
    assert(g711ToLinear(0x2a, aLaw = true) === -32256)
    assert(g711ToLinear(0xaa, aLaw = true) === 32256)
    // segment 1 boundary: code 0x45 = (0x45^0x55)=0x10 -> seg 1 mant 0 -> -264
    assert(g711ToLinear(0x45, aLaw = true) === -264)
  }

  test("expansion is odd-symmetric: flipping the sign bit negates") {
    for (c <- 0 until 128) {
      assert(g711ToLinear(c, aLaw = false) === -g711ToLinear(c ^ 0x80, aLaw = false))
      assert(g711ToLinear(c, aLaw = true) === -g711ToLinear(c ^ 0x80, aLaw = true))
    }
  }

  test("expansion is monotone within each sign half") {
    // mu-law: codes 0xFF down to 0x80 are increasing positive magnitudes
    val pos = (0 to 127).map(k => g711ToLinear(0xff - k, aLaw = false))
    assert(pos === pos.sorted)
    // A-law positive half sorted by decoded value must also be strict
    val apos = (0 to 127).map(c => g711ToLinear(c | 0x80, aLaw = true)).sorted
    assert(apos.distinct.size === 128)
  }

  test("container round trip: every code byte, both laws, odd length pads") {
    for (aLaw <- Seq(false, true)) {
      val codes = Array.tabulate(257)(i => i % 256) // odd length -> pad byte
      val wav = synthWavG711(1, 8000, codes, aLaw)
      val info = wavHeader(wav).get
      assert(info.channels === 1 && info.bitsPerSample === 8 &&
        info.nFrames === 257)
      val got = wavSamplesG711(wav).get
      assert(got.toSeq === codes.toSeq.map(g711ToLinear(_, aLaw)))
    }
  }

  test("wavSamplesG711 rejects PCM and unknown tags; wavSamples rejects G.711") {
    val pcm = Multimodal.synthWavPcm(1, 8000, 16, Array(1, -2, 3))
    assert(wavSamplesG711(pcm).isEmpty)
    val g = synthWavG711(1, 8000, Array(0x55, 0xd5), aLaw = true)
    assert(Multimodal.wavSamples(g).isEmpty)
  }
}
