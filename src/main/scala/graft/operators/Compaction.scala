package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass that turns a
  * file inventory (path, bytes, partition) into rewrite groups of
  * approximately `targetBytes` each. At 100 TB the small-file problem IS the
  * scan-performance problem (a million 1 MB files cost more in task setup
  * and footer reads than the data itself), and the planning step must itself
  * be distributed: this one is a prefix scan over the inventory.
  *
  * Packing rule: within each table partition, files are laid out in a
  * deterministic order and assigned to bin floor(prefix / target), where
  * `prefix` is the EXCLUSIVE running byte sum — i.e. next-fit packing with
  * fixed byte boundaries. Every bin except the last holds at least `target`
  * bytes once its boundary-crossing file lands, no bin is split across
  * partitions, and the assignment is replayable (same inventory + order →
  * same plan) so a retried planning job emits identical rewrite groups.
  *
  * Scale shape: the running sum rides the two-phase distributed
  * [[PrefixScan]] (r10) rather than a per-partition window — bit-identical
  * prefix bytes, but a skewed table partition (millions of files) scans in
  * parallel across data partitions instead of serializing on one window
  * task. No self-join, no driver-side loop beyond the scan's bounded
  * offset collect; the inventory rows are (path, bytes) pairs — never data.
  */
object Compaction {

  /** Per-file bin assignment: input columns + `bin` (0-based within the
    * partition) + `prefix_bytes` (exclusive running sum used for the
    * assignment, exposed for audit).
    *
    * Resource note: the scan persists its sorted inventory (narrow: partition
    * key, order key, one Long per file) for the result's lifetime; the blocks
    * are ContextCleaner-released when the returned frame is dropped, so a
    * long-lived planner loop holds at most the plans it still references
    * ([[PrefixScan]] lifecycle scaladoc). */
  def plan(files: DataFrame, partCol: String, sizeCol: Column,
           orderCol: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    PrefixScan.exclusivePrefixSum(
        files.withColumn("__bytes", sizeCol.cast("long")),
        partCol, Seq(orderCol), "__bytes", "prefix_bytes")
      .drop("__bytes")
      .withColumn("bin", floor(col("prefix_bytes") / targetBytes))
  }

  /** The rewrite-group summary a compactor would execute: one row per
    * (partition, bin) with file count and total bytes. */
  def groups(files: DataFrame, partCol: String, sizeCol: Column,
             orderCol: Column, targetBytes: Long): DataFrame =
    plan(files, partCol, sizeCol, orderCol, targetBytes)
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(sizeCol.cast("long")).as("total_bytes"))
}
