package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity math over `array<float/double>` columns as pure Column
  * expressions — the embedding-column twin of [[Kernels]]. Everything here
  * compiles into whole-stage codegen (no UDF), and every fold is a LEFT fold
  * so results are bit-reproducible against the DuckDB oracle's list_reduce.
  */
object ArrayOps {

  /** Elementwise cast to double (float embeddings → exact double). */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Left-fold sum of an array<double>. */
  def fsum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two array<double> columns (left fold, in index order). */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x * y))

  /** Squared L2 norm. */
  def norm2sq(a: Column): Column = dot(a, a)

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2sq(a)) * sqrt(norm2sq(b)))

  /** 0–100 scaled |cosine| (reference kernel convention). */
  def cosine100(a: Column, b: Column): Column = abs(cosine(a, b)) * 100.0

  /** L1 distance. */
  def l1(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => abs(x - y)))

  /** Support size: number of elements strictly above `thr`. */
  def supportSize(a: Column, thr: Double): Column =
    size(filter(a, x => x > thr))

  /** Intersection size of the two >thr supports. */
  def supportIntersect(a: Column, b: Column, thr: Double): Column =
    size(filter(zip_with(a, b, (x, y) => x > thr && y > thr), p => p))

  /** Elementwise mismatch count of the >thr binarizations (hamming distance
    * of the binary patterns). */
  def binaryMismatch(a: Column, b: Column, thr: Double): Column =
    size(filter(zip_with(a, b, (x, y) => (x > thr) =!= (y > thr)), p => p))
}
