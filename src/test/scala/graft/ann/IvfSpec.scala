package graft.ann

import graft.SparkSpec
import graft.io.Tables
import graft.similarity.ArrayOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF ANN: exact brute-force equivalence at nProbe == k, and sane partial
  * probing. */
class IvfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val t = Tables.embeddings(spark, dir)
    .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))

  private lazy val probes = t.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("q_id"), col("v").as("qv"))

  private def ivfTop(k: Int, nProbe: Int): Set[(Long, Long, Int)] = {
    val index = Ivf.build(t, "v", k = k)
    Ivf.search(index, probes, "vec_id", "v", topK = 5, nProbe = nProbe)
      .select(col("q_id"), col("cand_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private lazy val bruteTop: Set[(Long, Long, Int)] = {
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("cand_id"))
    probes.crossJoin(t).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        ArrayOps.cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("cand_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("nProbe == k reproduces exact brute-force top-k") {
    assert(ivfTop(k = 8, nProbe = 8) == bruteTop)
  }

  test("fromCentroids matches the column-expression argmin and is exact at nProbe==k") {
    val cents = t.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("centroid_id"), col("v").as("cvec"))
    val index = Ivf.fromCentroids(t, "v", cents)
    // column-expression twin of the narrow-map assignment (the Ivf.search
    // routing arithmetic) — every row must agree, ties included
    val d2 = ArrayOps.norm2sq(col("v")) + ArrayOps.norm2sq(col("cvec")) -
      lit(2.0) * ArrayOps.dot(col("v"), col("cvec"))
    val w = Window.partitionBy("vec_id").orderBy(asc("d2"), asc("centroid_id"))
    val twin = t.crossJoin(broadcast(cents)).withColumn("d2", d2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
    val got = index.assigned.select(col("vec_id"), col("centroid_id"))
    assert(got.exceptAll(twin).isEmpty && twin.exceptAll(got).isEmpty)
    // a pinned quantizer cancels out of the result entirely at nProbe == k
    val full = Ivf.search(index, probes, "vec_id", "v", topK = 5, nProbe = 8)
      .select(col("q_id"), col("cand_id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == bruteTop)
  }

  test("partial probing returns topK per probe with plausible recall") {
    val got = ivfTop(k = 8, nProbe = 2)
    val nProbes = probes.count()
    assert(got.size == nProbes * 5, "topK rows per probe")
    // synthetic embeddings are near-uniform (no cluster structure), so the
    // informative bound is "beats blind partition sampling" = nProbe/k = 0.25
    val recall = got.intersect(bruteTop).size.toDouble / bruteTop.size
    assert(recall > 0.25, s"recall@5 no better than blind probing: $recall")
  }
}
