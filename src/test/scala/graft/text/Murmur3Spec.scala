package graft.text

import org.apache.spark.ml.feature.HashingTF
import org.scalatest.funsuite.AnyFunSuite

/** The clean-room murmur3 must agree with Spark ML's HashingTF bucketing
  * bit-for-bit — that equality is what licenses the DuckDB SQL replay to
  * stand as the q_tfidf_features oracle. */
class Murmur3Spec extends AnyFunSuite {

  private val tf1024 = new HashingTF().setNumFeatures(1024)
  private val tf97 = new HashingTF().setNumFeatures(97)

  private val corpus: Seq[String] = Seq(
    "", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg", "abcdefgh",
    "the", "quick", "brown", "foxes", "jumped", "statistical",
    "antidisestablishmentarianism", "x" * 33,
    "Tokens_with_underscores", "MiXeDcAsE", "0numbers9",
    // multibyte UTF-8: exercises the sign-extended tail and word paths
    "café", "naïve", "日本語", "🎉emoji", "ß", "Ωmega"
  ) ++ (0 until 200).map(i => s"tok${i}synth${i * 31}")

  test("hash matches HashingTF.indexOf across lengths, scripts, and seeds") {
    corpus.foreach { t =>
      assert(Murmur3.bucket(t, 1024) == tf1024.indexOf(t), s"term '$t' @1024")
      assert(Murmur3.bucket(t, 97) == tf97.indexOf(t), s"term '$t' @97")
    }
  }

  test("bucket is nonNegativeMod of the signed hash") {
    corpus.foreach { t =>
      val h = Murmur3.hash(t)
      val b = Murmur3.bucket(t, 1024)
      assert(b >= 0 && b < 1024)
      assert((b - h) % 1024 == 0 || (b - (h % 1024 + 1024) % 1024) == 0)
    }
  }

  test("SQL replay chain is well-formed (CTE names, no unbound columns)") {
    val sql = Murmur3.oracleSqlCtes("terms", 1024, words = 6)
    assert(sql.contains("mm_sb") && sql.contains("mm_hash"))
    // stages must chain: every mm_s/t/f CTE is referenced exactly once
    for (n <- Seq("mm_s0", "mm_s5", "mm_t0", "mm_t1", "mm_f0", "mm_f5"))
      assert(sql.contains(n), s"missing stage $n")
  }

  test("SQL replay raises a loud error past the byte cap, not a wrong hash") {
    // a term longer than words*4+3 bytes is outside the replay's domain;
    // the oracle must fail with error() so a corpus regen that introduces a
    // long token reads as an oracle-domain failure, not a hash mismatch
    val sql = Murmur3.oracleSqlCtes("terms", 1024, words = 6)
    assert(sql.contains("error('murmur3 oracle byte cap exceeded"))
    assert(sql.contains("cap=27"), "cap must reflect words*4+3")
  }
}
