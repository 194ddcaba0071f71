package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for shuffle-based joins and aggregations.
  *
  * At cluster scale a single hot key (one state's bills, one power user's
  * events) lands an entire shuffle partition on one task; AQE's skew-join
  * splitting handles the sort-merge-join case at runtime, but only after the
  * skewed shuffle files exist, and it never helps shuffle-based DISTINCT
  * aggregation. These rewrites spread hot keys at plan time:
  *
  *  - [[saltedJoin]]: append a deterministic per-row salt to the big side's
  *    key and replicate the small(er) side across all salt values — a hot
  *    key's rows fan out over `salts` shuffle partitions. Every (left, right)
  *    row pair still meets exactly once: the left row owns ONE salt and the
  *    right row is present at every salt.
  *  - [[exactCountDistinct]]: per-key exact distinct count as
  *    distinct-then-count — the first shuffle keys on (key, value), so a hot
  *    key's duplicates spread across the cluster and collapse before the
  *    per-key count ever sees them.
  *
  * (The reference hand-tunes skew with fixed `repartition(n)` heuristics,
  * `Utils.scala:110-121`; these operators replace that with key-spreading
  * that does not depend on cluster geometry.)
  */
object SkewOps {

  /** Inner equi-join with the big (skewed) side salted.
    *
    * @param big   skewed probe side; salt is derived from the full row, so
    *              duplicate rows of one key still spread
    * @param small build side, replicated ×`salts` — size its broadcast/shuffle
    *              footprint accordingly
    * @param keys  equi-join key columns present on both sides
    * @param salts fan-out per key; a hot key spreads over this many partitions
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 8): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val b = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Exact per-key COUNT(DISTINCT value) that survives value-skew: shuffle 1
    * dedups on (keys, value) — hot keys spread over the value hash — and
    * shuffle 2 counts the now-small per-key sets.
    */
  def exactCountDistinct(df: DataFrame, keys: Seq[String],
                         valueCol: String): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"n_distinct_$valueCol"))
}
