package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) — the
  * point-frequency analogue of the HLL cardinality gate (q_approx_distinct /
  * q_hll_merge): a depth×width table of counters where every key increments
  * one counter per row and a point estimate is the MIN over its counters.
  *
  * Guarantees (depth d, width w, N total increments): the estimate never
  * undercounts, and overcounts by more than (e/w)·N with probability at most
  * e^−d per probe. Both sides of that band are asserted per-key in the
  * q_cms_topk gate query.
  *
  * Why it matters at 100 TB: the buffer is a FIXED-SIZE array (d·w longs,
  * 64 KB at the defaults) with elementwise-sum merge, so the map-side combine
  * emits one 64 KB partial per partition regardless of input size — frequency
  * tracking without shuffling the key stream, and sketches of disjoint slices
  * merge into exactly the sketch of the union (asserted in CountMinSpec),
  * which is the daily-partition → monthly-rollup maintenance pattern.
  *
  * The per-row hash is a multiply-shift over the 32-bit fold of the key,
  * chosen so the probe side is expressible entirely in codegen'd builtin
  * Columns (bitwiseXOR / shiftrightunsigned / multiply / element_at / least —
  * no UDF on the probe path). Constants stay below 2^30 so the products stay
  * below 2^62: overflow-free under ANSI arithmetic on both the JVM reduce
  * path and the Column probe path, which must agree bit-for-bit.
  */
object CountMin {

  val Depth = 4
  val DefaultWidth = 2048

  // Odd multipliers < 2^30 (murmur/xxhash mixing constants truncated to 30
  // bits) + arbitrary 32-bit offsets. Fixed: the sketch layout is part of the
  // probe contract.
  private[graft] val MulA: Array[Long] =
    Array(0x27d4eb2dL, 0x165667b1L, 0x2545f491L, 0x1b873593L)
  private[graft] val AddB: Array[Long] =
    Array(0x85ebca6bL, 0xc2b2ae35L, 0x9e3779b9L, 0x61c88647L)

  /** Row-i counter index for a key: fold to 32 bits (xor-shift — keeps ids
    * ≥ 2^31 apart from colliding trivially), then the Dietzfelbinger
    * multiply-shift on the 32-bit word: the HIGH log2(width) bits of the LOW
    * 32 bits of y·A+B. Taking the high bits of the low word (not of the full
    * product) is what makes the family universal — small keys reach every
    * bucket. Width must be a power of two so the extraction is a shift. */
  private[graft] def hashIdx(x: Long, i: Int, width: Int): Int = {
    val y = (x ^ (x >>> 31)) & 0xffffffffL
    (((y * MulA(i) + AddB(i)) & 0xffffffffL) >>> (32 - log2(width))).toInt
  }

  private[graft] def log2(width: Int): Int = {
    require(width >= 2 && Integer.bitCount(width) == 1,
      s"CMS width must be a power of two, got $width")
    Integer.numberOfTrailingZeros(width)
  }

  /** The same index computation as [[hashIdx]] in builtin Columns. */
  private def hashIdxCol(key: Column, i: Int, width: Int): Column = {
    val y = key.bitwiseXOR(shiftrightunsigned(key, 31))
      .bitwiseAND(lit(0xffffffffL))
    shiftrightunsigned(
      (y * lit(MulA(i)) + lit(AddB(i))).bitwiseAND(lit(0xffffffffL)),
      32 - log2(width))
  }

  /** Mergeable CMS aggregator. Buffer/output: row-major flattened d×w table. */
  class Sketch(width: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(width >= 2)
    def zero: Array[Long] = new Array[Long](Depth * width)
    def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var i = 0
      while (i < Depth) { buf(i * width + hashIdx(x, i, width)) += 1L; i += 1 }
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

  /** Column function: CMS sketch of a long key column. */
  def countMin(width: Int = DefaultWidth): UserDefinedFunction =
    udaf(new Sketch(width), ExpressionEncoder[Long]())

  /** Point-frequency estimate of `key` from a sketch column: min over the
    * Depth counters. Pure builtin Columns — stays inside whole-stage codegen
    * even though the sketch itself was built by an Aggregator. */
  def estimate(sketch: Column, key: Column, width: Int = DefaultWidth): Column =
    least((0 until Depth).map { i =>
      element_at(sketch,
        (hashIdxCol(key, i, width) + lit(i.toLong * width) + lit(1L)).cast("int"))
    }: _*)

  /** The advertised additive error band: eps·N with eps = e/width. */
  def errorBound(nTotal: Column, width: Int = DefaultWidth): Column =
    ceil(lit(math.E / width) * nTotal).cast("long")
}
