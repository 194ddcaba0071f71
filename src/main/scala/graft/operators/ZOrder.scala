package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the write-layout
  * companion to [[graft.io.Tables.writeRangeClustered]]: interleaving the
  * bits of two dimension keys makes rows that are close in BOTH dimensions
  * close in the one sort key, so parquet min/max stats prune a 2-D box
  * predicate instead of only the leading sort column.
  *
  * Why it matters at 100 TB: a linear sort on (x) prunes x-predicates only —
  * a query filtering on y reads every file. A z-ordered layout bounds each
  * file's (x, y) footprint to a Morton range, so a box predicate skips files
  * on BOTH dimensions (the Delta Lake / Iceberg OPTIMIZE ZORDER pattern,
  * asserted against an adversarial linear layout in ZOrderSpec).
  *
  * The interleave is pure builtin bit arithmetic (shift/and/or — inside
  * whole-stage codegen, no UDF) and is replayed term-for-term in the
  * q_zorder DuckDB oracle (queries.PipelineQueries delegates here — one
  * interleave for the key query and the write layout).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of x and y: bit i of x lands at
    * position 2i, bit i of y at 2i+1. Callers mask/bucketize the dimensions
    * into [0, 2^bits) first (the result is < 2^(2·bits), so bits ≤ 31 is
    * overflow-free). */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as DuckDB SQL over column expressions `x`, `y`
    * (already masked to `bits` bits) — one `|`-joined term per bit. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Write `df` z-clustered on (xCol, yCol): each output file owns a
    * DISJOINT CONTIGUOUS Morton range (→ a bounded (x, y) box), rows sorted
    * by the Morton key within each file so row groups inherit tight stats.
    * The helper columns are dropped before the write — layout only, schema
    * unchanged.
    *
    * File boundaries are exact equi-width Morton buckets from one cheap
    * min/max pass over the key, NOT `repartitionByRange`: RangePartitioner
    * seeds its reservoir sample from the RDD id, so the same write produced
    * different file boundaries depending on unrelated session history
    * (order-dependent pruning flake), and a sampled boundary never hard-
    * guarantees a file owns one contiguous range. Bucket i is
    * [min + i·width, min + (i+1)·width) by construction — deterministic
    * across runs, sessions, and data order, which is also the property a
    * table-maintenance OPTIMIZE job needs at 100 TB (idempotent re-runs
    * produce byte-identical layouts). The bucket→file map is an explicit
    * RDD `Partitioner` (partition i = bucket i): hash-repartitioning on the
    * bucket would collide ~1/e of buckets into shared files, destroying the
    * one-range-per-file guarantee. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int, nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val withZ = df.withColumn("__z", interleave(col(xCol), col(yCol), bits))
    val bounds = withZ.agg(min("__z"), max("__z")).head()
    if (bounds.isNullAt(0)) { // empty input — schema-only write
      df.write.mode("overwrite").parquet(path)
      return
    }
    val minZ = bounds.getLong(0)
    val maxZ = bounds.getLong(1)
    val width = math.max(1L, (maxZ - minZ) / nFiles + 1)
    // `div` (integer division) keeps the arithmetic exact for 62-bit Morton
    // keys — float division would lose precision past 2^53. A null xCol/yCol
    // yields a null Morton key; those rows land deterministically in bucket 0
    // (nulls-first, matching the sort order `sortWithinPartitions` gives the
    // null __z rows) instead of NPE-ing in the partitioner (ADVICE r9).
    val bucketed = withZ.withColumn("__bucket",
      coalesce(expr(s"cast(((__z - ${minZ}L) div ${width}L) as int)"), lit(0)))
    val schema = bucketed.schema
    val bIdx = schema.fieldIndex("__bucket")
    val byBucket = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nFiles
      override def getPartition(key: Any): Int =
        math.min(nFiles - 1, math.max(0, key.asInstanceOf[Int]))
    }
    val rows = bucketed.rdd.map(r => (r.getInt(bIdx), r))
      .partitionBy(byBucket).map(_._2)
    df.sparkSession.createDataFrame(rows, schema)
      .sortWithinPartitions("__z")
      .drop("__z", "__bucket")
      .write.mode("overwrite").parquet(path)
  }
}
