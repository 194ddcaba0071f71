package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Typed Aggregators — the Spark-4 form of the reference's UDAF surface.
  *
  * The reference used the removed `UserDefinedAggregateFunction` for
  * element-wise vector sum (reference src/test/scala/UDAFTest.scala:19-51) and
  * a typed Aggregator for per-group buffering (AggregatorTest2.scala:20-31);
  * Histogrammar for histograms (utils/Plot.scala:31). All three re-land here
  * as `Aggregator[IN, BUF, OUT]` registered via `udaf()` — partial aggregation
  * (map-side combine) comes free through reduce/merge, which is what keeps the
  * shuffle small at 100 TB: combiners emit one buffer per partition per key,
  * not one row per input.
  */
object Aggregators {

  /** Element-wise sum of array<double> columns (A4's VectorSum). Null-safe:
    * null arrays are skipped; the buffer grows to the first seen length. */
  class VectorSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.emptyDoubleArray
    def reduce(buf: Array[Double], in: Seq[Double]): Array[Double] = {
      if (in == null) return buf
      val b = if (buf.length >= in.length) buf else {
        val nb = new Array[Double](in.length)
        System.arraycopy(buf, 0, nb, 0, buf.length); nb
      }
      var i = 0
      while (i < in.length) { b(i) += in(i); i += 1 }
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.length >= b.length) { var i = 0; while (i < b.length) { a(i) += b(i); i += 1 }; a }
      else { var i = 0; while (i < a.length) { b(i) += a(i); i += 1 }; b }
    def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Fixed-bin histogram with under/over/NaN-flow (A9, the Histogrammar
    * Bin(n, lo, hi) shape). Buffer layout: [bin0..binN-1, under, over, nan]. */
  class Histogram(nBins: Int, lo: Double, hi: Double)
      extends Aggregator[Double, Array[Long], Seq[Long]] {
    private val width = (hi - lo) / nBins
    def zero: Array[Long] = new Array[Long](nBins + 3)
    def reduce(buf: Array[Long], x: Double): Array[Long] = {
      val idx =
        if (x.isNaN) nBins + 2
        else if (x < lo) nBins
        else if (x >= hi) nBins + 1
        else math.min(((x - lo) / width).toInt, nBins - 1)
      buf(idx) += 1
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

  /** Column function: element-wise sum of an array<double> column. */
  def vectorSum: UserDefinedFunction =
    udaf(new VectorSum, ExpressionEncoder[Seq[Double]]())

  /** Column function: histogram of a double column → array of bin counts
    * [bin0..binN-1, underflow, overflow, nan]. */
  def histogram(nBins: Int, lo: Double, hi: Double): UserDefinedFunction =
    udaf(new Histogram(nBins, lo, hi), ExpressionEncoder[Double]())
}
