package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** IMA ADPCM (WAV tag 0x11) decode laws: automaton arithmetic, container
  * round trips, nibble order, clamp/saturation edges, and an encode twin
  * tracking law (a greedy IMA encoder's output decodes back to within one
  * step of the input — the codec's defining property). */
class AdpcmSpec extends AnyFunSuite {
  import Multimodal.{imaStep, synthWavAdpcm, wavSamplesAdpcm,
    ImaStepTable, ImaIndexTable}

  test("published tables: 89 steps ending at 32767, index adjust ±") {
    assert(ImaStepTable.length === 89)
    assert(ImaStepTable.head === 7 && ImaStepTable.last === 32767)
    assert(ImaStepTable.toSeq === ImaStepTable.sorted.toSeq)
    assert(ImaIndexTable.toSeq === Seq(-1, -1, -1, -1, 2, 4, 6, 8,
      -1, -1, -1, -1, 2, 4, 6, 8))
  }

  test("automaton: nibble 0 adds step>>3, nibble 8 subtracts it") {
    // si=30 -> step 130: diff = 130>>3 = 16
    assert(imaStep(100, 30, 0) === ((116, 29)))
    assert(imaStep(100, 30, 8) === ((84, 29)))
    // nibble 7: diff = step>>3 + step>>2 + step>>1 + step... for step 130:
    // 16 + 32 + 65 + 130 = 243; index += 8
    assert(imaStep(0, 30, 7) === ((243, 38)))
  }

  test("predictor clamps at ±32768 bounds; step index saturates 0..88") {
    val (pHi, _) = imaStep(32700, 88, 7)
    assert(pHi === 32767)
    val (pLo, _) = imaStep(-32700, 88, 15)
    assert(pLo === -32768)
    assert(imaStep(0, 0, 0)._2 === 0)   // -1 clamps at 0
    assert(imaStep(0, 88, 4)._2 === 88) // +2 clamps at 88
  }

  test("container round trip: header sample + low-nibble-first unpacking") {
    val nibbles = Array(3, 12, 0, 15, 8, 7)
    val wav = synthWavAdpcm(8000, -1234, 42, nibbles)
    val got = wavSamplesAdpcm(wav).get
    var pred = -1234; var si = 42
    val want = Array.newBuilder[Int]
    want += pred
    nibbles.foreach { nb =>
      val s = imaStep(pred, si, nb); pred = s._1; si = s._2; want += pred
    }
    assert(got.toSeq === want.result().toSeq)
    val info = Multimodal.wavHeader(wav).get
    assert(info.bitsPerSample === 4 && info.channels === 1)
  }

  test("greedy encoder twin: decoded output tracks the input within a step") {
    // standard IMA encode: pick the nibble that best approximates the
    // desired delta under the current step size, then run the SAME decode
    // automaton to stay in sync
    def encode(samples: Array[Int], s0: Int): (Array[Int], Int) = {
      var pred = samples.head; var si = s0
      val nibs = samples.tail.map { x =>
        val step = ImaStepTable(si)
        var diff = x - pred
        var nib = if (diff < 0) { diff = -diff; 8 } else 0
        if (diff >= step) { nib |= 4; diff -= step }
        if (diff >= step / 2) { nib |= 2; diff -= step / 2 }
        if (diff >= step / 4) nib |= 1
        val s = imaStep(pred, si, nib); pred = s._1; si = s._2
        nib
      }
      (nibs, samples.head)
    }
    val rnd = new Random(7)
    var x = 0.0
    val wave = Array.tabulate(201) { i =>
      x += rnd.nextInt(401) - 200 // bounded-delta walk an ADPCM can follow
      math.max(-30000, math.min(30000, x.toInt))
    }
    val (nibs, p0) = encode(wave, 20)
    val got = wavSamplesAdpcm(synthWavAdpcm(8000, p0, 20, nibs)).get
    assert(got.length === wave.length)
    // after warm-up the reconstruction must track within ~2 adapted steps
    val errs = wave.drop(10).zip(got.drop(10)).map { case (a, b) => math.abs(a - b) }
    assert(errs.max <= 2 * ImaStepTable(40),
      s"max reconstruction error ${errs.max}")
  }

  test("extended-fmt samplesPerBlock caps per-block emission") {
    // a conforming file whose block carries fewer samples than its nibble
    // capacity implies: the trailing nibbles are padding, not samples
    val nibbles = Array(3, 12, 0, 15, 8, 7)
    val wav = synthWavAdpcm(8000, -1234, 42, nibbles) // samplesPerBlock = 7
    val full = wavSamplesAdpcm(wav).get
    assert(full.length === 7)
    val patched = wav.clone()
    patched(38) = 5 // samplesPerBlock u16le at fmt data offset 18
    patched(39) = 0
    val capped = wavSamplesAdpcm(patched).get
    assert(capped.toSeq === full.take(5).toSeq)
  }

  test("rejects PCM and G.711 tags; those decoders reject ADPCM") {
    val pcm = Multimodal.synthWavPcm(1, 8000, 16, Array(1, -2, 3))
    assert(wavSamplesAdpcm(pcm).isEmpty)
    val g = Multimodal.synthWavG711(1, 8000, Array(0x55), aLaw = true)
    assert(wavSamplesAdpcm(g).isEmpty)
    val a = synthWavAdpcm(8000, 0, 0, Array(1, 2))
    assert(Multimodal.wavSamples(a).isEmpty)
    assert(Multimodal.wavSamplesG711(a).isEmpty)
  }

  test("decoder is total on malformed bytes") {
    val rnd = new Random(11)
    for (_ <- 0 until 200) {
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      wavSamplesAdpcm(junk) // must not throw
    }
    val wav = synthWavAdpcm(8000, 77, 5, Array(1, 2, 3, 4))
    for (cut <- 0 until wav.length) {
      wavSamplesAdpcm(wav.take(cut)) // truncations must not throw
    }
  }
}
