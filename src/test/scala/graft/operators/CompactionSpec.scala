package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Next-fit compaction planning: fixed byte boundaries on the exclusive
  * prefix sum, boundary-crossing files stay in their starting bin, bins
  * never span partitions, and the plan is replayable. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(rows: Seq[(String, Long, Long)], target: Long) =
    Compaction.plan(rows.toDF("part", "id", "bytes"),
        "part", col("bytes"), col("id"), target)
      .select("part", "id", "bin")
      .as[(String, Long, Long)].collect().toSeq.sorted

  test("next-fit boundaries on the exclusive prefix sum") {
    // sizes 5,5,5 @ target 10: prefixes 0,5,10 → bins 0,0,1
    assert(planOf(Seq(("p", 1L, 5L), ("p", 2L, 5L), ("p", 3L, 5L)), 10L)
      .map(_._3) === Seq(0L, 0L, 1L))
  }

  test("boundary-crossing file lands in its starting bin") {
    // sizes 8,8 @ target 10: second file starts at prefix 8 → still bin 0
    assert(planOf(Seq(("p", 1L, 8L), ("p", 2L, 8L)), 10L)
      .map(_._3) === Seq(0L, 0L))
  }

  test("oversized file occupies its own boundary and advances the next bin") {
    // sizes 25,2 @ target 10: prefixes 0,25 → bins 0,2 (bin 1 skipped)
    assert(planOf(Seq(("p", 1L, 25L), ("p", 2L, 2L)), 10L)
      .map(_._3) === Seq(0L, 2L))
  }

  test("bins never span partitions") {
    val out = planOf(
      Seq(("a", 1L, 9L), ("a", 2L, 9L), ("b", 1L, 1L)), 10L)
    assert(out === Seq(("a", 1L, 0L), ("a", 2L, 0L), ("b", 1L, 0L)))
  }

  test("groups summary counts files and bytes per (partition, bin)") {
    val g = Compaction.groups(
        Seq(("p", 1L, 5L), ("p", 2L, 5L), ("p", 3L, 5L))
          .toDF("part", "id", "bytes"),
        "part", col("bytes"), col("id"), 10L)
      .select("part", "bin", "n_files", "total_bytes")
      .as[(String, Long, Long, Long)].collect().toSeq.sorted
    assert(g === Seq(("p", 0L, 2L, 10L), ("p", 1L, 1L, 5L)))
  }
}
