package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** KMV / bottom-k sketches (Bar-Yossef et al. 2002; Beyer et al. 2007) — the
  * ORDER-STATISTICS member of the engine's sketch family, next to HLL
  * (cardinality registers, q_approx_distinct) and Count-Min (frequency
  * counters, q_cms_topk). One mergeable primitive — "keep the k smallest
  * hash values" — yields four operators:
  *
  *   - distinct-count estimate:   (k−1)·P / h₍k₎          (q_kmv_distinct)
  *   - set-operation estimates:   union / intersection / Jaccard from the
  *     merged sketch, no re-scan                           (q_kmv_setops)
  *   - uniform fixed-size sample: the k rows with the smallest key hash are
  *     a uniform without-replacement sample                (q_sample_bottomk)
  *   - sampled quantiles: order statistics of that sample estimate
  *     population quantiles with DKW rank error            (q_quantile_sketch)
  *
  * What distinguishes KMV from HLL here: the hash is the SAME multiplicative
  * permutation the engine already replays in DuckDB ((a·x + b) mod p with
  * p = 2³¹−1 — a bijection on [0, p) for a coprime to p, so distinct keys
  * give distinct hashes), which makes every estimate above EXACTLY
  * reproducible in SQL: the gates hash-match the estimates themselves, a
  * strictly stronger check than the error-certified flags the opaque-sketch
  * gates settle for.
  *
  * Why it matters at 100 TB: the buffer is a bounded sorted array (k longs;
  * 2 KB at k = 256) whose merge is "merge two sorted sets, keep the k
  * smallest" — so the map-side combine emits one bounded partial per
  * partition regardless of input size, and sketches of disjoint slices merge
  * into EXACTLY the sketch of their union (asserted in KmvSpec — same
  * lossless-merge law as HLL registers and CMS counters). A month's sample
  * or distinct estimate is the merge of 30 daily sketches, no raw re-scan.
  *
  * Domain: keys must be non-negative (the fixture ids are); the hash reduces
  * mod p first so any long key is accepted, but SQL replays use plain `%`
  * which differs for negative inputs. Because hashing is mod p = 2³¹−1,
  * distinct keys that differ by a multiple of p COLLIDE and are silently
  * deduplicated by the sketch, while a raw-row SQL oracle would rank them
  * separately — the "exact bottom-k of distinct keys" law therefore needs
  * |key| < p (or keys unique mod p). The gate fixtures satisfy it; for key
  * domains beyond 2³¹ the sketches take `wide = true`, which swaps the hash
  * for [[hash64]] — the splitmix64 finalizer, a BIJECTION on the full
  * 64-bit long domain, so no two distinct keys ever collide and the
  * precondition disappears entirely (q_kmv64 gates it; the SQL replay is
  * [[splitmix64SqlCtes]], the same staged HUGEINT emulation as the
  * bills-source oracle).
  */
object Kmv {

  /** 2³¹ − 1, prime. All hash values lie in [0, P). */
  val P = 2147483647L

  /** Multiplier (coprime to P → the map is a permutation) and offset.
    * a·(x mod P) + b < 2⁶² — overflow-free under ANSI arithmetic on both the
    * JVM reduce path and the Column/SQL probe paths, which must agree
    * bit-for-bit. */
  val HashA = 1103515245L
  val HashB = 12345L

  private[graft] def hash(x: Long): Long = {
    val r = x % P
    val xr = if (r < 0) r + P else r
    (HashA * xr + HashB) % P
  }

  /** The same hash as a builtin-Column expression (codegen'd, no UDF). */
  def hashCol(x: Column): Column =
    (lit(HashA) * pmod(x, lit(P)) + lit(HashB)) % lit(P)

  /** The same hash in DuckDB SQL (valid for non-negative keys). */
  def hashSql(x: String): String =
    s"($HashA * ($x % $P) + $HashB) % $P"

  // ------------------------------------------------------------ 64-bit hash

  /** splitmix64 finalizer (Steele et al., public domain; same constants as
    * [[graft.sources.BillsGen.mix]]) — a bijection on the FULL 64-bit long
    * domain, so distinct keys NEVER collide and the mod-P domain
    * precondition above vanishes. Java long arithmetic wraps mod 2⁶⁴, which
    * is exactly the unsigned semantics the algorithm wants; ordering the
    * sketch by the SIGNED result is still a fixed total order of a
    * permutation, so the bottom-k is still a uniform sample. */
  def hash64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** DuckDB CTE chain replaying [[hash64]] for every row of `inRel`'s
    * `keyCol`: unsigned 64-bit arithmetic emulated stage by stage — values
    * live in HUGEINT mod 2⁶⁴, xor runs in the signed-BIGINT bit-pattern
    * domain, each 64×64 multiply splits hi/lo so the 128-bit intermediate
    * fits HUGEINT (the bills-source oracle pattern,
    * queries/Relational.billsStateOracleSql). Ends in a CTE
    * `sm_h(key64, h)` with h the SIGNED 64-bit hash. */
  def splitmix64SqlCtes(inRel: String, keyCol: String): String = {
    def tos(c: String) =
      s"CAST(CASE WHEN $c >= 9223372036854775808 THEN $c - 18446744073709551616 ELSE $c END AS BIGINT)"
    def tou(c: String) =
      s"(CASE WHEN $c < 0 THEN CAST($c AS HUGEINT) + 18446744073709551616 ELSE CAST($c AS HUGEINT) END)"
    def xoru(a: String, b: String) = tou(s"xor(${tos(a)}, ${tos(b)})")
    def mulmod(a: String, c: String) =
      s"((($a % 4294967296) * $c + ((($a // 4294967296) * $c) % 4294967296) * 4294967296) % 18446744073709551616)"
    s"""
    sm_u0 AS (SELECT $keyCol AS key64,
                     ${tou(s"CAST($keyCol AS BIGINT)")} AS z FROM $inRel),
    sm_a1 AS (SELECT key64, (z + 11400714819323198485) % 18446744073709551616 AS z FROM sm_u0),
    sm_b1 AS (SELECT key64, ${xoru("z", "(z // 1073741824)")} AS z FROM sm_a1),
    sm_c1 AS (SELECT key64, ${mulmod("z", "13787848793156543929")} AS z FROM sm_b1),
    sm_b2 AS (SELECT key64, ${xoru("z", "(z // 134217728)")} AS z FROM sm_c1),
    sm_c2 AS (SELECT key64, ${mulmod("z", "10723151780598845931")} AS z FROM sm_b2),
    sm_h AS (SELECT key64, ${tos(xoru("z", "(z // 2147483648)"))} AS h FROM sm_c2)"""
  }

  // ---------------------------------------------------------------- sketch

  /** Mergeable KMV sketch: the k smallest DISTINCT hash values of the keys,
    * sorted ascending. Buffer is a sorted array ≤ k — insertion is a binary
    * search + shift (k ≤ a few hundred), merge is a sorted-merge truncated
    * at k. */
  class Sketch(k: Int, wide: Boolean = false)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k >= 1)
    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], x: Long): Array[Long] = {
      val h = if (wide) hash64(x) else hash(x)
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf // larger than current kth
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val take =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
          else { val v = b(j); j += 1; v }
        if (o == 0 || out(o - 1) != take) { out(o) = take; o += 1 }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column function: KMV sketch of a long key column. */
  def kmv(k: Int): UserDefinedFunction =
    udaf(new Sketch(k), ExpressionEncoder[Long]())

  /** 64-bit-domain KMV sketch ([[hash64]] — collision-free on ANY long
    * keys). Sketch values are SIGNED splitmix64 outputs, ascending. */
  def kmv64(k: Int): UserDefinedFunction =
    udaf(new Sketch(k, wide = true), ExpressionEncoder[Long]())

  /** Distinct-count estimate from a [[kmv64]] sketch: the signed k-th value
    * maps to unsigned rank space via +2⁶³, est = (k−1)·2⁶⁴ / u₍k₎. Single
    * IEEE-double expression, identical op order to the SQL replay. */
  def estimate64(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble * 1.8446744073709552E19) /
          (element_at(sk, k).cast("double") + lit(9.223372036854776E18)), 4))

  /** Distinct-count estimate from a sketch column: exact size when the
    * buffer never filled, else (k−1)·P / h₍k₎ (Beyer et al. 2007 unbiased
    * form), rounded to 4 digits. Pure builtin Columns. */
  def estimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(round(estimateRaw(sk, k), 4))

  /** Unrounded estimator branch (callers composing further arithmetic must
    * round once, at the end, exactly like their SQL oracle). */
  def estimateRaw(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble * P) / element_at(sk, k))

  /** Sketch of the UNION of two key sets from their sketches: the k smallest
    * of K(A) ∪ K(B) (which equals the k smallest of A ∪ B's hashes, since
    * the union's bottom-k lies inside each side's bottom-k). */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Jaccard estimate: fraction of the union sketch present in BOTH input
    * sketches (Beyer et al. §5). Unrounded — compose then round once. */
  def jaccardRaw(u: Column, a: Column, b: Column): Column =
    size(array_intersect(array_intersect(u, a), b)).cast("double") /
      size(u).cast("double")

  // ------------------------------------------------------- bottom-k sample

  /** Mergeable bottom-k SAMPLE: keeps the payloads of the k rows whose key
    * hash is smallest — a uniform without-replacement sample (the hash is a
    * fixed permutation of the key space), deterministic and replayable in
    * SQL as a window rank. Buffer: parallel (hash, payload) arrays, sorted
    * by hash, distinct hashes (one payload per key). */
  class BottomK(k: Int, wide: Boolean = false)
      extends Aggregator[(Long, Double), (Array[Long], Array[Double]), Seq[Double]] {
    require(k >= 1)
    def zero: (Array[Long], Array[Double]) =
      (Array.emptyLongArray, Array.emptyDoubleArray)

    def reduce(buf: (Array[Long], Array[Double]), x: (Long, Double)):
        (Array[Long], Array[Double]) = {
      val (hs, ps) = buf
      val h = if (wide) hash64(x._1) else hash(x._1)
      val pos = java.util.Arrays.binarySearch(hs, h)
      if (pos >= 0) buf
      else {
        val ins = -pos - 1
        if (hs.length >= k && ins >= k) buf
        else {
          val n = math.min(hs.length + 1, k)
          val oh = new Array[Long](n); val op = new Array[Double](n)
          System.arraycopy(hs, 0, oh, 0, ins); System.arraycopy(ps, 0, op, 0, ins)
          oh(ins) = h; op(ins) = x._2
          System.arraycopy(hs, ins, oh, ins + 1, n - ins - 1)
          System.arraycopy(ps, ins, op, ins + 1, n - ins - 1)
          (oh, op)
        }
      }
    }

    def merge(a: (Array[Long], Array[Double]), b: (Array[Long], Array[Double])):
        (Array[Long], Array[Double]) = {
      val n = math.min(a._1.length + b._1.length, k)
      val oh = new Array[Long](n); val op = new Array[Double](n)
      var i = 0; var j = 0; var o = 0
      while (o < n && (i < a._1.length || j < b._1.length)) {
        val fromA = j >= b._1.length || (i < a._1.length && a._1(i) <= b._1(j))
        val (h, p) = if (fromA) { val t = (a._1(i), a._2(i)); i += 1; t }
                     else { val t = (b._1(j), b._2(j)); j += 1; t }
        if (o == 0 || oh(o - 1) != h) { oh(o) = h; op(o) = p; o += 1 }
      }
      if (o == n) (oh, op)
      else (java.util.Arrays.copyOf(oh, o), java.util.Arrays.copyOf(op, o))
    }

    def finish(buf: (Array[Long], Array[Double])): Seq[Double] = buf._2.toSeq
    def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
      ExpressionEncoder[(Array[Long], Array[Double])]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column function: bottom-k sample of `payload` keyed by `key`'s hash,
    * payloads returned in hash order. */
  def bottomK(k: Int): UserDefinedFunction =
    udaf(new BottomK(k), ExpressionEncoder[(Long, Double)]())

  /** 64-bit-domain bottom-k sample (collision-free on ANY long keys). */
  def bottomK64(k: Int): UserDefinedFunction =
    udaf(new BottomK(k, wide = true), ExpressionEncoder[(Long, Double)]())

  /** Type-1 sampled quantile: the ⌊q·(m−1)⌋+1-th smallest sample value
    * (m = sample size). DKW: rank error ≤ √(ln(2/δ)/2k) w.p. 1−δ. */
  def sampleQuantile(sortedSample: Column, q: Double): Column =
    element_at(sortedSample,
      (floor(lit(q) * (size(sortedSample) - 1)) + 1).cast("int"))

  // ------------------------------------------------------ weighted priority

  /** Second independent multiplier/offset for the double-hashing stride. */
  val HashA2 = 1588635695L
  val HashB2 = 453816693L

  /** Efraimidis–Spirakis-equivalent priority for INTEGER weights without
    * transcendentals (cross-engine double `exp`/`ln`/`pow` are not
    * bit-reproducible): an item of weight w draws w uniform hashes and keeps
    * the MAX — the same law as ES keys u^(1/w) (both are the max of w
    * uniforms), so top-K by priority descending is a weighted
    * without-replacement sample. The draws use DOUBLE HASHING,
    * h_j(x) = (h₁(x) + j·h₂(x)) mod p: a per-item stride h₂(x), NOT a shared
    * constant — with a shared offset the w draws are comonotone (max ≈ h₁
    * for every weight, weight has no effect; KmvSpec pinned that failure).
    * h₁ + j·h₂ < 6·2³¹ — overflow-free. Pure builtin Columns
    * (sequence/transform/array_max), replayable in SQL as GREATEST over the
    * unrolled j. */
  /** PRECONDITION: weight ≥ 1 (integer). `sequence(1, w)` DESCENDS for
    * w < 1, so weight 0 would silently draw [1, 0] — two uniforms, i.e. a
    * weight-0 item sampled like weight ~2, diverging from the SQL GREATEST
    * unroll which gates on w ≥ j. Guarded here: w < 1 → null priority
    * (dropped by any top-K), matching "no draws" on the SQL side. */
  def weightedPriority(key: Column, weight: Column): Column = {
    val h1 = (lit(HashA) * pmod(key, lit(P)) + lit(HashB)) % lit(P)
    val h2 = (lit(HashA2) * pmod(key, lit(P)) + lit(HashB2)) % lit(P)
    when(weight.cast("long") >= 1L,
      array_max(transform(
        sequence(lit(1L), greatest(weight.cast("long"), lit(1L))),
        j => (h1 + j * h2) % lit(P))))
  }

  /** The j-th weighted-priority draw in DuckDB SQL (unroll + GREATEST). */
  def weightedDrawSql(x: String, j: Int): String = {
    val h1 = s"($HashA * ($x % $P) + $HashB) % $P"
    val h2 = s"($HashA2 * ($x % $P) + $HashB2) % $P"
    s"(($h1) + $j * ($h2)) % $P"
  }
}
