package graft.text

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003) —
  * the rolling-hash fingerprinting scheme behind MOSS-style near-dup and
  * plagiarism detection, and the "document fingerprinting (rolling hash)"
  * capability of a training-data pipeline.
  *
  * Pipeline per document: Rabin-Karp polynomial rolling hash over character
  * k-grams, then select in every window of `w` consecutive k-gram hashes the
  * minimum value (rightmost occurrence on ties). Guarantee: any shared
  * substring of length ≥ k + w − 1 between two documents yields at least one
  * shared (hash) fingerprint, while only ~2/(w+1) of all k-grams are kept.
  *
  * Arithmetic is fixed so the DuckDB oracle can replay it bit-for-bit:
  * h(c₀..c₍ₖ₋₁₎) = Σ cᵢ·B^(k−1−i) mod M with B = 257, M = 1 000 003 over
  * UTF-16 code units (== code points == DuckDB `ascii()` for the ASCII
  * corpus). All intermediates stay far below 2^63.
  */
object Winnowing {

  val Base = 257L
  val Mod = 1000003L

  private def powMod(b: Long, e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r = r * b % Mod; i += 1 }
    r
  }

  /** Selected fingerprints of `s`, packed as (kgramPos << 32) | hash with
    * 0-based k-gram start positions, sorted by position. Documents with fewer
    * than `w` k-grams (length < k + w − 1) have no complete window and yield
    * no fingerprints — mirrored by the oracle's `range(0, n − w + 1)`. */
  def packedFingerprints(s: String, k: Int, w: Int): Array[Long] = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val n = s.length - k + 1
    if (n < w) return Array.emptyLongArray
    val hs = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + s.charAt(i)) % Mod; i += 1 }
    hs(0) = h
    val pk = powMod(Base, k - 1)
    i = 1
    while (i < n) {
      h = (((h - s.charAt(i - 1) * pk % Mod + Mod) % Mod) * Base
        + s.charAt(i + k - 1)) % Mod
      hs(i) = h
      i += 1
    }
    // rightmost-min-per-window; selected positions are non-decreasing as the
    // window slides, so appending on position change yields a sorted distinct
    // list. O(n·w) with the small w used here.
    val out = new scala.collection.mutable.ArrayBuffer[Long](2 * n / (w + 1) + 1)
    var lastPos = -1
    var p = 0
    while (p <= n - w) {
      var sel = p
      var j = p + 1
      while (j < p + w) {
        if (hs(j) <= hs(sel)) sel = j // <= keeps the rightmost occurrence
        j += 1
      }
      if (sel != lastPos) {
        out += (sel.toLong << 32) | hs(sel)
        lastPos = sel
      }
      p += 1
    }
    out.toArray
  }

  /** Codegen-callable wrapper returning Spark's ArrayData directly. */
  def packedArrayData(s: String, k: Int, w: Int): ArrayData =
    new GenericArrayData(packedFingerprints(s, k, w))
}
