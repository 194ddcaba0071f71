package graft.ann

import graft.SparkSpec
import graft.io.Tables
import graft.similarity.ArrayOps
import org.apache.spark.sql.functions._

/** ANN index persistence: a saved-then-loaded index must search identically
  * to the in-memory one — the production serving shape where one build per
  * corpus generation amortizes across sessions (the MinHashIndex round-trip
  * contract, ModelPersistenceSpec, extended to the vector indexes).
  * Covers Ivf (two parquet tables), Pq (codes + codebook parquet + m/dsub
  * sidecar), and the composed IvfPq deployment loaded from both halves.
  */
class AnnPersistenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val t = Tables.embeddings(spark, dir)
    .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))

  private lazy val probes = t.filter(col("vec_id") % 50 === 0)
    .select(col("vec_id").as("q_id"), col("v").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("Ivf save/load round-trips and searches identically") {
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val built = Ivf.build(t, "v", k = 8)
    Ivf.save(built, path)
    val loaded = Ivf.load(spark, path)
    val a = Ivf.search(built, probes, "vec_id", "v", topK = 5, nProbe = 3)
    val b = Ivf.search(loaded, probes, "vec_id", "v", topK = 5, nProbe = 3)
    assert(rows(a) == rows(b))
    assert(rows(a).nonEmpty)
  }

  test("Pq save/load round-trips codebooks exactly and scores identically") {
    val path = java.nio.file.Files.createTempDirectory("pq_idx").toString
    val sliced = t.select(col("vec_id").as("id16"),
      transform(slice(col("v"), 1, 16), x => when(x >= 0, 1.0).otherwise(-1.0))
        .as("v16"))
    val built = Pq.build(sliced, "id16", "v16", m = 4, k = 16)
    Pq.save(built, path)
    val loaded = Pq.load(spark, path)
    assert(loaded.m == built.m && loaded.dsub == built.dsub)
    // codebooks are doubles written to parquet — exact round-trip
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      built.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val p16 = sliced.filter(col("id16") % 50 === 0)
      .select(col("id16").as("q_id"), col("v16").as("qv"))
    val a = Pq.search(built, p16, topK = 5)
    val b = Pq.search(loaded, p16, topK = 5)
    assert(rows(a) == rows(b))
    assert(rows(a).nonEmpty)
  }

  test("IvfPq searches identically from two loaded halves") {
    val ivfPath = java.nio.file.Files.createTempDirectory("ivfpq_i").toString
    val pqPath = java.nio.file.Files.createTempDirectory("ivfpq_p").toString
    val ivf = Ivf.build(t, "v", k = 8)
    val pq = Pq.build(t.select(col("vec_id").as("__id0"), col("v")),
      "__id0", "v", m = 4, k = 16)
    Ivf.save(ivf, ivfPath); Pq.save(pq, pqPath)
    val a = IvfPq.search(ivf, pq, probes, "vec_id", topK = 5, nProbe = 3)
    val b = IvfPq.search(Ivf.load(spark, ivfPath), Pq.load(spark, pqPath),
      probes, "vec_id", topK = 5, nProbe = 3)
    assert(rows(a) == rows(b))
    assert(rows(a).nonEmpty)
  }
}
