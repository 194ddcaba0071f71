package graft.ann

import graft.SparkSpec
import graft.io.Tables
import graft.similarity.ArrayOps
import org.apache.spark.sql.functions._

/** Exact cosine-threshold self-join: ring/pivot pruning must return the
  * mathematical answer set — driver brute-force parity across thresholds,
  * including a low one that stresses wide rings and a high one where the
  * pivot filters actually prune. */
class CosineJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val t = Tables.embeddings(spark, dir)
    .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))

  private lazy val vecs: Array[(Long, Array[Double])] =
    t.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private def bruteForce(minCos: Double): Set[(Long, Long)] = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den > 0) d / den else Double.NaN
    }
    (for {
      (i1, v1) <- vecs; (i2, v2) <- vecs
      if i1 < i2 && cos(v1, v2) >= minCos
    } yield (i1, i2)).toSet
  }

  private def joined(minCos: Double): Set[(Long, Long)] =
    CosineJoin.selfJoin(t, "vec_id", "v", minCos)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches driver brute force at a mid threshold") {
    val got = joined(0.4)
    assert(got == bruteForce(0.4))
    assert(got.nonEmpty, "fixture should contain cos >= 0.4 pairs")
  }

  test("matches driver brute force at a low threshold (wide rings)") {
    assert(joined(0.05) == bruteForce(0.05))
  }

  test("matches driver brute force at a high threshold (tight rings)") {
    assert(joined(0.9) == bruteForce(0.9))
  }

  test("dedupAgainst survivors match driver brute force") {
    val batch = t.filter(col("vec_id") % 17 === 0)
    val corpus = t.filter(col("vec_id") % 17 =!= 0)
    val got = CosineJoin.dedupAgainst(batch, corpus, "vec_id", "v", 0.4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pairs = bruteForce(0.4)
    val want = vecs.map(_._1).filter(_ % 17 == 0)
      .filterNot(bid => pairs.exists { case (a, b) =>
        (a == bid && b % 17 != 0) || (b == bid && a % 17 != 0)
      }).toSet
    assert(got == want)
  }
}
