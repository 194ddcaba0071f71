package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Typed Aggregators — the Spark-4 form of the reference's UDAF surface.
  *
  * The reference used the removed `UserDefinedAggregateFunction` for
  * element-wise vector sum (reference src/test/scala/UDAFTest.scala:19-51) and
  * a typed Aggregator for per-group buffering (AggregatorTest2.scala:20-31);
  * Histogrammar for histograms (utils/Plot.scala:31). All three re-land here
  * as `Aggregator[IN, BUF, OUT]` registered via `udaf()` — partial aggregation
  * (map-side combine) comes free through reduce/merge, which is what keeps the
  * shuffle small at 100 TB: combiners emit one buffer per partition per key,
  * not one row per input.
  */
object Aggregators {

  /** Element-wise sum of array<double> columns (A4's VectorSum). Null-safe:
    * null arrays are skipped; the buffer grows to the first seen length. */
  class VectorSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(buf: Array[Double], in: Seq[Double]): Array[Double] = {
      if (in == null) return buf
      val b = if (buf.length >= in.length) buf else {
        val nb = new Array[Double](in.length)
        System.arraycopy(buf, 0, nb, 0, buf.length); nb
      }
      var i = 0
      while (i < in.length) { b(i) += in(i); i += 1 }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.length >= b.length) { var i = 0; while (i < b.length) { a(i) += b(i); i += 1 }; a }
      else { var i = 0; while (i < a.length) { b(i) += a(i); i += 1 }; b }
    def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Fixed-bin histogram with under/over/NaN-flow (A9, the Histogrammar
    * Bin(n, lo, hi) shape). Buffer layout: [bin0..binN-1, under, over, nan]. */
  class Histogram(nBins: Int, lo: Double, hi: Double)
      extends Aggregator[Double, Array[Long], Seq[Long]] {
    private val width = (hi - lo) / nBins
    def zero: Array[Long] = new Array[Long](nBins + 3)
    def reduce(buf: Array[Long], x: Double): Array[Long] = {
      val idx =
        if (x.isNaN) nBins + 2
        else if (x < lo) nBins
        else if (x >= hi) nBins + 1
        else math.min(((x - lo) / width).toInt, nBins - 1)
      buf(idx) += 1
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Per-key top-k as a BOUNDED min-heap Aggregator — the scale form of
    * "row_number() over (partition by key order by score desc) <= k". The
    * window form sorts every group in full (O(n log n) per key, whole group
    * resident in one task); this buffer never holds more than k (score, id)
    * pairs, partial-aggregates map-side, and merges heaps pairwise — O(n log
    * k) and shuffle traffic of one k-row buffer per partition per key.
    * Ties break toward the smaller id (deterministic, oracle-matchable).
    * Output: ids of the top-k scores, ordered score desc then id asc. */
  class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
    require(k > 0, s"k must be positive: $k")
    // (score, id) ranks higher when score greater, or equal score + smaller id
    private def outranks(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
      if (buf.sizeIs < k) buf :+ in
      else {
        // buffer is unordered; replace the weakest slot if the new row
        // outranks it (positional update keeps duplicates intact)
        var weakIdx = 0
        var i = 1
        while (i < buf.length) {
          if (outranks(buf(weakIdx), buf(i))) weakIdx = i
          i += 1
        }
        if (outranks(in, buf(weakIdx))) buf.updated(weakIdx, in) else buf
      }
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (a ++ b).sortWith(outranks).take(k)
    def finish(buf: Seq[(Double, Long)]): Seq[Long] =
      buf.sortWith(outranks).map(_._2)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Misra-Gries heavy-hitter sketch over a string key (Misra & Gries 1982):
    * at most `k` counters; any key with frequency > N/(k+1) is guaranteed to
    * survive in the summary, and every stored count underestimates the true
    * count by at most N/(k+1). The buffer is a bounded map, so the map-side
    * partial is O(k) per partition regardless of input size — at 100 TB the
    * shuffle carries one k-entry map per partition, not the key stream.
    *
    * Merge is the standard summary merge: add counts pairwise, then if more
    * than k keys remain, subtract the (k+1)-th largest count from all and drop
    * the non-positive ones (Agarwal et al. 2013 mergeability result — the
    * error bound composes across partitions).
    *
    * finish() returns the CANDIDATE key set (sorted). Counts are deliberately
    * not returned: they are biased low; the intended pattern (q_freq_items)
    * re-counts the ≤ k candidates exactly in a second bounded pass.
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(k >= 1)
    def zero: Map[String, Long] = Map.empty
    def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
      buf.get(key) match {
        case Some(n) => buf.updated(key, n + 1L)
        case None if buf.size < k => buf.updated(key, 1L)
        case None => // decrement-all step: drop keys reaching zero
          buf.flatMap { case (w, n) => if (n > 1L) Some(w -> (n - 1L)) else None }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (w, n)) =>
        m.updated(w, m.getOrElse(w, 0L) + n)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k) // (k+1)-th largest
        sum.flatMap { case (w, n) => if (n > cut) Some(w -> (n - cut)) else None }
      }
    }
    def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  /** [[TopK]] keeping the scores: output is the (score, id) pairs ordered
    * score desc / id asc — for consumers (ANN search) whose output schema
    * carries the score next to the id. Same bounded buffer and merge. */
  class TopKScored(k: Int) extends
      Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val inner = new TopK(k)
    def zero: Seq[(Double, Long)] = inner.zero
    def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
      inner.reduce(buf, in)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      inner.merge(a, b)
    def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
      buf.sortWith((x, y) => x._1 > y._1 || (x._1 == y._1 && x._2 < y._2))
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Bounded k-smallest-by-(string key, id) aggregation — the deterministic
    * per-group sample / first-k-postings primitive. Keeps the k smallest
    * (key, id) pairs under lexicographic (key asc, id asc); buffer is ≤ k
    * entries, so the map-side partial is O(k) per partition and the merge is
    * the order-respecting union-take — the bounded replacement for a
    * ROW_NUMBER window whose partition key has FEW distinct values (a
    * #groups-task global sort regardless of corpus size, the r10
    * q_retrieval_eval lesson). finish() returns the pairs ordered. */
  class BottomKByKey(k: Int) extends
      Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
    require(k >= 1)
    // keys compare as UNSIGNED UTF-8 BYTES — the ordering Spark's UTF8String
    // (and DuckDB's default collation) give a string ORDER BY. Scala's
    // String ordering compares UTF-16 code units, which disagrees beyond the
    // BMP (U+10000 sorts before U+FFFF in UTF-16, after it in UTF-8), so a
    // window replaced by this aggregator would silently return a different
    // k-smallest set on supplementary-plane keys.
    private val keyOrd: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
    }
    private val ord = Ordering.Tuple2(keyOrd, Ordering.Long)
    def zero: Seq[(String, Long)] = Seq.empty
    // binary-insert into the already-sorted buffer: O(log k) comparisons per
    // accepted row (each comparison allocates UTF-8 byte arrays) instead of
    // re-sorting the whole buffer — O(k log k) comparisons — on every accept
    // (ADVICE r10; immaterial at k=3, real if reused with large k)
    def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
      if (buf.size >= k && ord.lteq(buf.last, in)) buf
      else {
        val v = buf.toVector
        var lo = 0
        var hi = v.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ord.lteq(v(mid), in)) lo = mid + 1 else hi = mid
        }
        val ins = (v.take(lo) :+ in) ++ v.drop(lo)
        if (ins.size > k) ins.take(k) else ins
      }
    def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
      (a ++ b).sorted(ord).take(k)
    def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf.sorted(ord)
    def bufferEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Bounded member-list aggregation for "groups of at most `cap` members"
    * (r13): collects a group's long values into a buffer CAPPED at `cap`+1
    * entries — one past the cap is enough to prove the group is over it —
    * and finish() returns the SORTED list for within-cap groups and the
    * empty list for over-cap ones. Exact replacement for the two-step
    * `groupBy(k).count.filter(n <= cap)` + re-join-to-collect shape when
    * the values per group are UNIQUE (the caller's contract): the buffer
    * never exceeds cap+1 longs per group per partition regardless of how
    * hot the key is, so a boilerplate fingerprint shared by 10⁹ documents
    * costs 51 longs of task memory, not a 10⁹-element list. */
  class CappedDistinctList(cap: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(cap >= 1)
    def zero: Seq[Long] = Seq.empty
    def reduce(buf: Seq[Long], in: Long): Seq[Long] =
      if (buf.size > cap) buf else buf :+ in
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val m = a ++ b
      if (m.size > cap + 1) m.take(cap + 1) else m
    }
    def finish(buf: Seq[Long]): Seq[Long] =
      if (buf.size > cap) Seq.empty else buf.sorted
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column function: sorted member list of groups with ≤ cap UNIQUE
    * members, empty list for larger groups (see [[CappedDistinctList]]). */
  def cappedDistinctList(cap: Int): UserDefinedFunction =
    udaf(new CappedDistinctList(cap), ExpressionEncoder[Long]())

  /** Column function: the k smallest (key, id) pairs per group, key asc /
    * id asc. */
  def bottomKByKey(k: Int): UserDefinedFunction =
    udaf(new BottomKByKey(k), ExpressionEncoder[(String, Long)]())

  /** Column function: ids of the k largest scores per group, score desc /
    * id asc. Input: struct(score double, id long). */
  def topK(k: Int): UserDefinedFunction =
    udaf(new TopK(k), ExpressionEncoder[(Double, Long)]())

  /** Column function: (score, id) pairs of the k largest scores per group,
    * score desc / id asc — [[topK]] with the score kept in the output. */
  def topKScored(k: Int): UserDefinedFunction =
    udaf(new TopKScored(k), ExpressionEncoder[(Double, Long)]())

  /** Column function: element-wise sum of an array<double> column. */
  def vectorSum: UserDefinedFunction =
    udaf(new VectorSum, ExpressionEncoder[Seq[Double]]())

  /** Column function: Misra-Gries candidate heavy hitters of a string column
    * (bounded k-counter sketch; see [[MisraGries]]). */
  def misraGries(k: Int): UserDefinedFunction =
    udaf(new MisraGries(k), ExpressionEncoder[String]())

  /** Column function: histogram of a double column → array of bin counts
    * [bin0..binN-1, underflow, overflow, nan]. */
  def histogram(nBins: Int, lo: Double, hi: Double): UserDefinedFunction =
    udaf(new Histogram(nBins, lo, hi), ExpressionEncoder[Double]())
}
