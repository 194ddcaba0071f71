package graft.dedup

import graft.{SparkEntry, SparkSpec}
import graft.io.Tables
import graft.similarity.ArrayOps
import org.apache.spark.sql.functions._

/** Properties of the SemDeDup query (q_semdedup): cluster-scoped semantic
  * dedup must (a) keep at least one representative per near-dup group,
  * (b) never keep two survivors that are themselves near-dups within a
  * cluster (cos >= τ survivors would share a component edge), and (c) drop
  * only vectors that have a near-dup witness inside their own cluster.
  */
class SemDedupSpec extends SparkSpec {
  private val Tau = 0.35

  private lazy val survivors =
    SparkEntry.defs("q_semdedup").fn(spark, sfDir).cache()

  /** Same clustering as the query — the PINNED vec_id mod 16 label since
    * r12 (the conversion that made q_semdedup a full [sql] gate; the
    * seeded-fit blocking variant stays covered by q_kmeans_blocks and
    * q_semdedup_exact) — same ROUND(6) edge arithmetic, all within-cluster
    * pairs. */
  private lazy val withinClusterCos = {
    val emb = Tables.embeddings(spark, sfDir).repartition(32)
    val t = emb.select(col("vec_id"),
      pmod(col("vec_id"), lit(16)).as("prediction"),
      ArrayOps.asDouble(col("embedding")).as("v"))
    val a = t.select(col("prediction"), col("vec_id").as("id1"), col("v").as("v1"))
    val b = t.select(col("prediction"), col("vec_id").as("id2"), col("v").as("v2"))
    a.join(b, Seq("prediction")).filter(col("id2") > col("id1"))
      .select(col("prediction"), col("id1"), col("id2"),
        round(ArrayOps.cosine(col("v1"), col("v2")), 6).as("cos"))
      .cache()
  }

  test("survivors are a subset of the corpus and nothing is lost twice") {
    val total = Tables.embeddings(spark, sfDir).count()
    val n = survivors.count()
    assert(n > 0 && n <= total)
    assert(survivors.select("vec_id").distinct().count() == n)
  }

  test("no two survivors in the same cluster are near-dups") {
    val ids = survivors.select(col("vec_id"))
    val both = withinClusterCos.filter(col("cos") >= Tau)
      .join(ids.withColumnRenamed("vec_id", "id1"), "id1")
      .join(ids.withColumnRenamed("vec_id", "id2"), "id2")
    assert(both.count() == 0,
      "two surviving vectors in one cluster are cos>=tau near-dups")
  }

  test("every dropped vector has a near-dup witness in its cluster") {
    val dropped = Tables.embeddings(spark, sfDir).select("vec_id")
      .join(survivors.select("vec_id"), Seq("vec_id"), "left_anti")
    val witnesses = withinClusterCos.filter(col("cos") >= Tau)
      .select(explode(array(col("id1"), col("id2"))).as("vec_id")).distinct()
    val orphaned = dropped.join(witnesses, Seq("vec_id"), "left_anti")
    assert(orphaned.count() == 0,
      "a vector was dropped without any cos>=tau neighbor in its cluster")
  }
}
