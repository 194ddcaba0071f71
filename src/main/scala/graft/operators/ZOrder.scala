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

  /** Write `df` z-clustered on (xCol, yCol): range-partition by the Morton
    * key (each output file owns a contiguous Morton range → a bounded (x, y)
    * box) and sort within partitions so row groups inherit tight stats.
    * The helper column is dropped before the write — layout only, schema
    * unchanged. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int, nFiles: Int): Unit = {
    val z = interleave(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
