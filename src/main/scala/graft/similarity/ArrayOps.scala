package graft.similarity

import graft.expressions.{ArrayCosineParts, ArrayDot, ArrayL1, ArrayL2Sq, ArraySupportStats}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Similarity math over `array<float/double>` columns — the embedding-column
  * twin of [[Kernels]]. Backed by graft's native codegen expressions
  * ([[graft.expressions.ArrayDot]] etc.): identical LEFT-fold IEEE op order to
  * the DuckDB oracle's list_reduce (bit-reproducible results), but evaluated
  * as primitive loops inside whole-stage codegen instead of the interpreted
  * higher-order-function path — the hot-loop cost of brute-force ANN is
  * |probes|·|corpus| kernel calls per scan.
  */
object ArrayOps {

  private def e(c: Column) = bridge.expression(c)

  /** Elementwise cast to double (float embeddings → exact double). */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Left-fold sum of an array<double>. */
  def fsum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns (left fold, in index order). */
  def dot(a: Column, b: Column): Column = bridge.column(ArrayDot(e(a), e(b)))

  /** Squared L2 norm. */
  def norm2sq(a: Column): Column = dot(a, a)

  /** Squared Euclidean distance Σ(aᵢ−bᵢ)² (left fold, in index order). */
  def l2sq(a: Column, b: Column): Column = bridge.column(ArrayL2Sq(e(a), e(b)))

  /** Euclidean distance. */
  def euclidean(a: Column, b: Column): Column = sqrt(l2sq(a, b))

  /** One-pass [dot, ‖a‖², ‖b‖²] (1-indexed via element_at). */
  def cosineParts(a: Column, b: Column): Column =
    bridge.column(ArrayCosineParts(e(a), e(b)))

  /** Cosine similarity in [-1, 1] — one array pass; codegen subexpression
    * elimination dedups the parts column. Zero-norm vectors yield NaN instead
    * of an ANSI DIVIDE_BY_ZERO error (one degenerate row must not kill a
    * 1000-executor job). */
  def cosine(a: Column, b: Column): Column = {
    val p = cosineParts(a, b)
    val denom = sqrt(element_at(p, 2)) * sqrt(element_at(p, 3))
    when(denom > 0.0, element_at(p, 1) / denom).otherwise(lit(Double.NaN))
  }

  /** 0–100 scaled |cosine| (reference kernel convention). */
  def cosine100(a: Column, b: Column): Column = abs(cosine(a, b)) * 100.0

  /** L1 distance. */
  def l1(a: Column, b: Column): Column = bridge.column(ArrayL1(e(a), e(b)))

  /** One-pass [|supp(a)|, |supp(b)|, |∩|, mismatches] at threshold (1-indexed
    * via element_at). */
  def supportStats(a: Column, b: Column, thr: Double): Column =
    bridge.column(ArraySupportStats(e(a), e(b), thr))

  /** Support size: number of elements strictly above `thr`. */
  def supportSize(a: Column, thr: Double): Column =
    element_at(supportStats(a, a, thr), 1).cast("int")

  /** Intersection size of the two >thr supports. */
  def supportIntersect(a: Column, b: Column, thr: Double): Column =
    element_at(supportStats(a, b, thr), 3).cast("int")

  /** Elementwise mismatch count of the >thr binarizations (hamming distance
    * of the binary patterns). */
  def binaryMismatch(a: Column, b: Column, thr: Double): Column =
    element_at(supportStats(a, b, thr), 4).cast("int")
}
