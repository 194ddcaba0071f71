package graft.ann

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sign-random-projection (SimHash-style) LSH for embedding columns — the
  * engine's scale path for approximate nearest neighbors, standing in for the
  * reference's random-projection LSH blocking
  * (reference BucketedRandomProjectionLSHExample.scala:106-112).
  *
  * Hyperplanes are derived from md5, not a JVM RNG, so the exact same planes
  * can be re-created anywhere (tests, SQL oracles, other engines): component
  * h[j][i] = (md5_60bit("graft:j:i") mod 2001 − 1000) / 1000.
  *
  * The bucket id is a pure Column expression: vectors land in 2^nPlanes
  * buckets, the ANN join is bucket-equality (shuffled hash join on a 64-bit
  * key) — at 100 TB this is the difference between an O(N²) cross join and a
  * key-partitioned join.
  */
object SignLsh {

  /** First 60 bits of md5(s) as a non-negative Long. */
  def md5Long(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic hyperplane components in [-1, 1]. */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (j, i) =>
      (md5Long(s"graft:$j:$i") % 2001 - 1000) / 1000.0
    }

  /** Bucket id column for an array<double> embedding. Native codegen
    * expression ([[graft.expressions.SignLshBucket]]): one pass over the
    * vector for all planes, same per-plane left-fold op order as the oracle's
    * list_reduce, so the sign bits are bit-identical. */
  def bucket(v: Column, planes: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.SignLshBucket(
        org.apache.spark.sql.graft.bridge.expression(v),
        planes.map(_.toSeq).toSeq))

  // ---- oracle-SQL mirrors (literal-embedded, same fold order) ----

  private def sqlArray(p: Array[Double]): String =
    p.mkString("[", ",", "]::DOUBLE[]")

  /** DuckDB expression for dotConst over column expr `v` (a DOUBLE[]). */
  def sqlDotConst(v: String, plane: Array[Double]): String =
    s"list_reduce(list_transform(range(1, ${plane.length + 1}), " +
      s"i -> $v[i] * (${sqlArray(plane)})[i]), (x,y) -> x+y)"

  /** DuckDB expression for the bucket id of column expr `v`. */
  def sqlBucket(v: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${sqlDotConst(v, p)} > 0.0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
