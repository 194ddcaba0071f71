package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact rank-k selection (discrete quantile) without a global sort.
  *
  * Spark's exact `percentile` aggregate collects every value of a group into
  * one aggregation buffer — correct, and fine at gate scale, but a single
  * hot buffer at 100 TB. This operator gets the SAME exact answer in a
  * bounded number of full scans:
  *
  *   pass 1: equal-width histogram over [min, max] — one aggregation of
  *           `nBins` counters (map-side combined, nBins rows shuffle);
  *   walk:   the cumulative bin counts (nBins driver rows, not data rows)
  *           locate the bin holding rank k and the exact count before it;
  *   pass 2: only that bin's rows are sorted — a TakeOrdered of
  *           (k − before) ≤ bin-count rows, ~n/nBins in the non-adversarial
  *           case. If the bin is still huge (heavy value skew), RECURSE on
  *           the bin's sub-range: each level narrows the value range ×nBins,
  *           and an all-equal bin terminates via the min==max base case.
  *
  * The answer is exact regardless of floating-point bin-boundary choices:
  * rank arithmetic uses the SAME bin function for the histogram and the
  * pass-2 filter, so however a boundary row lands, `before` counts it
  * consistently. (The driver never sees data rows — only min/max/count
  * scalars and the nBins histogram, the same footprint as a k-means
  * centroid update.)
  */
object Quantile2Pass {

  /** Exact k-th smallest (1-based) value of a non-null double column. */
  @annotation.tailrec
  def kthSmallest(df: DataFrame, valueCol: String, k: Long,
                  nBins: Int = 1024, maxTake: Int = 1 << 20): Double = {
    require(k >= 1, s"rank must be >= 1: $k")
    val c = col(valueCol)
    val Row(mn: Double, mx: Double, n: Long) =
      df.agg(min(c), max(c), count(c)).head()
    require(k <= n, s"rank $k > non-null count $n")
    val wGuard = (mx - mn) / nBins
    if (mn == mx || wGuard == 0.0) {
      // degenerate range: equal values, or a sub-denormal span whose bin
      // width underflows to 0 (the bin expression would divide by zero
      // under ANSI). The span is at most nBins ulps — sort it directly.
      if (mn == mx) mn
      else df.select(c).orderBy(c).limit(k.toInt)
        .agg(max(c)).head().getDouble(0)
    } else {
      val w = wGuard
      val bin = least(floor((c - mn) / w).cast("int"), lit(nBins - 1))
      val hist = df.groupBy(bin.as("__b")).agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var before = 0L
      var b = 0
      while (before + hist.getOrElse(b, 0L) < k) {
        before += hist.getOrElse(b, 0L); b += 1
      }
      val inBin = df.filter(bin === b)
      if (hist(b) <= maxTake)
        inBin.select(c).orderBy(c).limit((k - before).toInt)
          .agg(max(c)).head().getDouble(0)
      else
        kthSmallest(inBin, valueCol, k - before, nBins, maxTake)
    }
  }
}
