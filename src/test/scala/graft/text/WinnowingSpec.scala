package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer et al. 2003): hand-checked rolling hash,
  * the paper's selection guarantees, and codegen parity of
  * [[graft.expressions.WinnowPack]] with the Scala core. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def unpack(packed: Array[Long]): Array[(Int, Long)] =
    packed.map(p => ((p >>> 32).toInt, p & 0xFFFFFFFFL))

  test("rolling hash equals direct polynomial evaluation") {
    val s = "the quick brown fox jumps over the lazy dog"
    val k = 5
    val n = s.length - k + 1
    // direct: h(i) = sum s(i+j) * B^(k-1-j) mod M
    def direct(i: Int): Long =
      (0 until k).foldLeft(0L)((acc, j) => (acc * Winnowing.Base + s.charAt(i + j)) % Winnowing.Mod)
    val fps = unpack(Winnowing.packedFingerprints(s, k, 4))
    assert(fps.nonEmpty)
    fps.foreach { case (pos, h) =>
      assert(pos >= 0 && pos < n)
      assert(h == direct(pos), s"hash mismatch at pos $pos")
    }
  }

  test("selection guarantees: min-of-window, rightmost ties, window coverage") {
    val s = "aababcabcdabcdeaababcabcdabcde" // repetitive -> hash ties occur
    val k = 3
    val w = 4
    def direct(i: Int): Long =
      (0 until k).foldLeft(0L)((acc, j) => (acc * Winnowing.Base + s.charAt(i + j)) % Winnowing.Mod)
    val n = s.length - k + 1
    val hs = Array.tabulate(n)(direct)
    val fps = unpack(Winnowing.packedFingerprints(s, k, w))
    val selected = fps.map(_._1).toSet
    // every window of w consecutive k-grams contains a selected position
    // (the paper's coverage guarantee), and it is the window's rightmost min
    for (p <- 0 to n - w) {
      val win = (p until p + w)
      val inWin = win.filter(selected)
      assert(inWin.nonEmpty, s"window at $p has no fingerprint")
      val m = win.map(hs).min
      val rightmostMin = win.filter(q => hs(q) == m).max
      assert(inWin.contains(rightmostMin) || inWin.exists(q => hs(q) == m))
    }
    // positions strictly increasing, hashes consistent
    assert(fps.map(_._1).toSeq == fps.map(_._1).toSeq.sorted.distinct)
    fps.foreach { case (pos, h) => assert(h == hs(pos)) }
  }

  test("documents shorter than k + w - 1 yield no fingerprints") {
    assert(Winnowing.packedFingerprints("", 5, 4).isEmpty)
    assert(Winnowing.packedFingerprints("abcdefg", 5, 4).isEmpty) // 3 kgrams < w
    assert(Winnowing.packedFingerprints("abcdefgh", 5, 4).length == 1) // exactly w
  }

  test("identical text yields identical fingerprints; shared long substring shares one") {
    val a = "xqzjvkwpfymdhgbtrcln abcdefghijklmnopqrstuvwxyz0123 uvtrwqzzjxkm"
    val b = "completely-other-prefix abcdefghijklmnopqrstuvwxyz0123 suffix-42"
    val k = 8; val w = 4
    val fa = unpack(Winnowing.packedFingerprints(a, k, w)).map(_._2).toSet
    val fb = unpack(Winnowing.packedFingerprints(b, k, w)).map(_._2).toSet
    assert(fa == unpack(Winnowing.packedFingerprints(a, k, w)).map(_._2).toSet)
    // shared substring of length 31 >= k + w - 1 = 11 -> guaranteed overlap
    assert((fa & fb).nonEmpty)
  }

  test("WinnowPack expression matches the Scala core through codegen and SQL") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short"),
      (3L, "aababcabcdabcdeaababcabcdabcde")).toDF("doc_id", "text")
    val viaCol = df.select($"doc_id", TextOps.winnow($"text", 5, 4).as("fps"))
      .as[(Long, Array[Long])].collect().toMap
    val viaSql = {
      df.createOrReplaceTempView("winnow_spec_docs")
      spark.sql("SELECT doc_id, graft_winnow(text, 5, 4) AS fps FROM winnow_spec_docs")
        .as[(Long, Array[Long])].collect().toMap
    }
    for ((id, text) <- Seq(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "short", 3L -> "aababcabcdabcdeaababcabcdabcde")) {
      val expected = Winnowing.packedFingerprints(text, 5, 4).toSeq
      assert(viaCol(id).toSeq == expected, s"Column API mismatch for doc $id")
      assert(viaSql(id).toSeq == expected, s"SQL function mismatch for doc $id")
    }
  }
}
