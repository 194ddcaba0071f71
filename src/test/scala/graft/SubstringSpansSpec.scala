package graft

import org.apache.spark.sql.functions._

/** The q_substring_spans interval arithmetic: with EQUAL-length (20-token)
  * windows and sorted starts, merging is pairwise — consecutive starts
  * belong to one merged span iff their difference ≤ 20 — so n_spans and
  * covered_tokens reduce to counts/sums over consecutive diffs. Fuzzed here
  * against an explicit interval-union reference.
  */
class SubstringSpansSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: union of [s, s+19] over the start set, as explicit spans. */
  private def refSpans(starts: Seq[Int]): (Long, Long) = {
    val sorted = starts.distinct.sorted
    if (sorted.isEmpty) return (0L, 0L)
    var spans = List((sorted.head, sorted.head + 19))
    for (s <- sorted.tail) {
      val (a, b) = spans.head
      if (s <= b + 1) spans = (a, math.max(b, s + 19)) :: spans.tail
      else spans = (s, s + 19) :: spans
    }
    (spans.length.toLong, spans.map { case (a, b) => (b - a + 1).toLong }.sum)
  }

  test("pairwise diff arithmetic equals explicit interval union (fuzz)") {
    val rnd = new scala.util.Random(11)
    val cases = (1 to 200).map { id =>
      val n = rnd.nextInt(12) + 1
      // starts with runs of adjacency, overlap, exact-touch (diff==20) and gaps
      val starts = Iterator.iterate(rnd.nextInt(5) + 1)(
        s => s + (rnd.nextInt(4) match {
          case 0 => rnd.nextInt(19) + 1   // overlap
          case 1 => 20                    // exact touch — must merge
          case 2 => 21                    // minimal gap — must split
          case _ => rnd.nextInt(40) + 21  // gap
        })).take(n).toSeq
      (id.toLong, starts)
    }
    val df = cases.toDF("doc_id", "starts")
      .select(col("doc_id"), array_sort(col("starts")).as("a"))
    val dcol = zip_with(
      slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
      slice(col("a"), lit(1), greatest(size(col("a")) - 1, lit(0))),
      (x, y) => x - y)
    val gaps = size(filter(dcol, x => x > 20))
    val within = aggregate(filter(dcol, x => x <= 20), lit(0), (acc, x) => acc + x)
    val got = df.select(col("doc_id"), (gaps + 1).cast("long").as("n_spans"),
        (lit(20) * (gaps + 1) + within).cast("long").as("covered"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, starts) <- cases)
      assert(got(id) === refSpans(starts), s"starts=$starts")
  }
}
