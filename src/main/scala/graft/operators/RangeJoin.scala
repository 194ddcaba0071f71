package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair each left "point" row (a timestamp)
  * with every right "interval" row whose `[start, end)` contains it. No equi
  * key exists, so Spark's only native plan is BroadcastNestedLoopJoin —
  * O(|L|·|R|) comparisons and a single-threaded build at scale.
  *
  * This is the scale-correct encoding: quantize time into fixed-width bins,
  * explode each interval into the bins it overlaps, map each point to its ONE
  * bin, then hash equi-join on the bin id and re-check the exact range
  * predicate. Each matching (point, interval) pair surfaces exactly once —
  * the point owns a single bin — so no dedup pass is needed. The shuffle is
  * an ordinary hash exchange on the bin id; cost scales with
  * |L| + |R|·(intervalWidth/binWidth) rather than |L|·|R|, and AQE splits any
  * hot bin. Bin width should be on the order of the typical interval length:
  * wider bins cut interval replication, narrower bins cut false candidates.
  *
  * (The reference has no range join; its only theta conditions are the
  * candidate-pair predicates, `Utils.scala:46-105`. This operator is part of
  * the training-pipeline extension surface, alongside [[AsOfJoin]].)
  */
object RangeJoin {

  /** @param points     left side; `ptCol` is a timestamp column
    * @param intervals  right side; `startCol`/`endCol` are timestamps,
    *                   interval semantics are half-open `[start, end)`
    * @param binSeconds quantization width — choose ≈ the typical interval
    *                   length so each interval lands in O(1) bins
    * @param keys       equi-columns present on BOTH sides (e.g. the entity
    *                   id): they join the shuffle key, so candidates are
    *                   (key, bin)-local instead of bin-local. This is the
    *                   production form at scale — an unkeyed range join over
    *                   N co-temporal intervals is pair-dense by construction
    *                   (output itself is Ω(N²) per bin), while the keyed form
    *                   scales like an as-of join: per-key interval counts are
    *                   bounded, so candidates grow linearly and a hot BIN no
    *                   longer concentrates on one task. Emitted once each
    *                   (left copy), like a Seq-style equi-join.
    * @return inner-join result carrying all columns of both inputs (callers
    *         should pre-alias collisions)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      binSeconds: Long = 3600L,
                      keys: Seq[String] = Nil): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    // bin arithmetic in MICROSECONDS (timestamp native precision): with
    // second-granularity floor, an end like ...:00.5 on a bin boundary would
    // never explode into its final partial-second bin and points there would
    // silently drop
    val bin = lit(binSeconds * 1000000L)
    val p = points.withColumn("__bin", floor(unix_micros(col(ptCol)) / bin))
    // end is exclusive: an interval closing exactly on a bin boundary does
    // not reach into that bin
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / bin),
        floor((unix_micros(col(endCol)) - 1) / bin))))
    val cond = keys.foldLeft(
      p("__bin") === i("__bin") &&
        col(ptCol) >= col(startCol) && col(ptCol) < col(endCol)) {
      (c, k) => c && p(k) === i(k)
    }
    keys.foldLeft(p.join(i, cond))((df, k) => df.drop(i(k))).drop("__bin")
  }

  /** Interval-overlap join: pair every left interval `[lStart, lEnd)` with
    * every right interval `[rStart, rEnd)` that overlaps it. Both sides
    * explode into their bins, so one overlapping pair would meet in EVERY
    * shared bin; instead of a dedup shuffle, the join keeps a pair only in
    * its COORDINATION BIN — the first bin the overlap region itself touches,
    * `bin(max(lStart, rStart))`. Each side already carries that bin (the
    * overlap start is one of the two starts), so the predicate is local and
    * each pair survives exactly once.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      binSeconds: Long = 3600L,
                      keys: Seq[String] = Nil): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    // microsecond bins, same reasoning as pointInInterval; `keys` as there —
    // equi-columns on both sides join the (key, bin) shuffle key and are
    // emitted once (left copy)
    val bin = lit(binSeconds * 1000000L)
    def explodeBins(df: DataFrame, s: String, e: String) =
      df.withColumn("__bin", explode(sequence(
        floor(unix_micros(col(s)) / bin),
        floor((unix_micros(col(e)) - 1) / bin))))
    val l = explodeBins(left, lStart, lEnd)
    val r = explodeBins(right, rStart, rEnd)
    val cond = keys.foldLeft(
      l("__bin") === r("__bin") &&
        col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        l("__bin") === floor(unix_micros(greatest(col(lStart), col(rStart))) / bin)) {
      (c, k) => c && l(k) === r(k)
    }
    keys.foldLeft(l.join(r, cond))((df, k) => df.drop(r(k))).drop("__bin")
  }
}
