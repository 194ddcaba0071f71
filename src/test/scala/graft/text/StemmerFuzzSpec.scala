package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Totality fuzz for the byte/char walkers added or touched in round 5:
  * stemmers walk character regions with hand-indexed suffix arithmetic, and
  * the JPEG marker walk follows length fields from untrusted bytes — the
  * classic out-of-bounds territory. Properties: never throw, and respect
  * their basic output contracts, over adversarial random inputs.
  */
class StemmerFuzzSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    // letters weighted toward the suffix alphabet, plus apostrophes and the
    // marked-Y/space/digit edge cases
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar,
      3 -> Gen.oneOf('a', 'e', 'i', 'o', 'u', 'y'),
      3 -> Gen.oneOf('s', 'e', 'd', 'l', 'i', 'n', 'g', 't'),
      1 -> Gen.const('\''),
      1 -> Gen.oneOf('Y', '0', '-')))
  } yield cs.mkString

  test("both stemmers are total and length-bounded on 20k adversarial words") {
    (0 until 20000).foreach { i =>
      val w = sample(wordGen, i.toLong)
      val p = PorterStemmer.stem(w)
      val s = SnowballStemmer.stem(w)
      assert(p != null && s != null)
      // a stemmer may only shorten or restore single letters — never grow a
      // word by more than the one restored 'e'
      assert(p.length <= w.length + 1, s"porter grew '$w' -> '$p'")
      assert(s.length <= w.length + 1, s"snowball grew '$w' -> '$s'")
      // internal consonant-Y marking must never leak for lowercase input
      if (!w.exists(_ == 'Y')) assert(!s.contains('Y'), s"'$w' -> '$s'")
    }
  }

  test("snowball suffix fixed-points: every rule output is itself stemmable") {
    // outputs of one pass never crash a second pass (regions shrink only)
    (0 until 5000).foreach { i =>
      val w = sample(wordGen, 100000L + i)
      val once = SnowballStemmer.stem(w)
      assert(SnowballStemmer.stem(once) != null)
    }
  }

}
