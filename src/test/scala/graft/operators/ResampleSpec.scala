package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-fill resample semantics: dense per-key grid between first and last
  * activity, zero-count gap rows, forward-filled totals, and key isolation
  * (one key's fill never leaks into another's). */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // key u: buckets 0 and 7200 active, 3600 is a gap.
  // key v: single bucket 3600 — spine must be exactly one row.
  private lazy val events = Seq(
    ("u", 10L, 1.5), ("u", 20L, 2.5),  // bucket 0, total 4.00
    ("u", 7210L, 7.0),                 // bucket 7200
    ("v", 3661L, 9.0)                  // bucket 3600
  ).toDF("k", "sec", "value")

  private lazy val out = Resample
    .gapFill(events, "k", col("sec"), col("value"), 3600L)
    .orderBy("k", "bucket")
    .as[(String, Long, Long, Double)].collect().toSeq

  test("dense spine with zero-count gap rows") {
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Seq(("u", 0L, 2L), ("u", 3600L, 0L), ("u", 7200L, 1L),
        ("v", 3600L, 1L)))
  }

  test("forward fill carries the last seen total across gaps, per key") {
    assert(out.map(_._4) === Seq(4.0, 4.0, 7.0, 9.0))
  }

  test("spine never extends beyond a key's observed range") {
    assert(out.count(_._1 == "v") === 1)
  }
}
