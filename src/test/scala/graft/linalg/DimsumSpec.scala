package graft.linalg

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** Dimsum id-space independence (r13): the sf1-equivalent registry run OOMed
  * because raw doc ids keyed the matrix columns — DIMSUM's magnitude
  * accumulators are dense numCols-sized arrays per task, so a 10M-stride id
  * space meant a 720 MB allocation per task. docSimilarities must (a) give
  * identical similarities whatever the id space, relabeled, and (b) survive
  * an id range whose DENSE extent (8 GB at stride 1e9) could never be
  * allocated — proving memory follows the corpus count, not the id range.
  */
class DimsumSpec extends SparkSpec {

  private def corpus(ids: Seq[Long]) = {
    import spark.implicits._
    // fixed tiny corpus: 6 docs over 5 terms, pairwise overlaps
    val rows = Seq(
      Vectors.sparse(5, Array(0, 1), Array(2.0, 1.0)),
      Vectors.sparse(5, Array(0, 1, 2), Array(1.0, 3.0, 1.0)),
      Vectors.sparse(5, Array(2, 3), Array(4.0, 1.0)),
      Vectors.sparse(5, Array(3, 4), Array(2.0, 2.0)),
      Vectors.sparse(5, Array(0, 4), Array(1.0, 5.0)),
      Vectors.sparse(5, Array(1, 3), Array(3.0, 3.0)))
    ids.zip(rows).toDF("doc_id", "features")
  }

  // threshold 0 ⇒ DIMSUM keeps every term with probability 1 (no sampling),
  // so the estimate degenerates to exact cosine and results are comparable
  // across id relabelings bit-for-bit.
  private def sims(ids: Seq[Long]): Map[(Long, Long), Double] =
    Dimsum.docSimilarities(corpus(ids), "doc_id", "features", threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

  test("rank remap: sparse ids give the dense-id answer, relabeled") {
    val denseIds = 0L until 6L
    val sparseIds = denseIds.map(i => 7L + i * 1000000000L) // 8 GB dense extent
    val expected = sims(denseIds).map { case ((a, b), v) =>
      ((sparseIds(a.toInt), sparseIds(b.toInt)), v)
    }
    assert(expected.nonEmpty)
    assert(sims(sparseIds) == expected)
  }

  test("dense [0, n) ids take the direct path unchanged") {
    val s = sims(0L until 6L)
    assert(s.keys.forall { case (a, b) => a < b && b < 6 })
    // spot-check one exact cosine: docs 2 (4e2+1e3) and 3 (2e3+2e4):
    // dot = 2, norms sqrt(17), sqrt(8)
    val expect = 2.0 / (math.sqrt(17.0) * math.sqrt(8.0))
    assert(math.abs(s((2L, 3L)) - expect) < 1e-12)
  }

  test("empty input yields an empty (d1,d2,cos_sim) frame") {
    val out = Dimsum.docSimilarities(corpus(Nil), "doc_id", "features", 0.3)
    assert(out.columns.toSeq == Seq("d1", "d2", "cos_sim"))
    assert(out.count() == 0)
  }
}
