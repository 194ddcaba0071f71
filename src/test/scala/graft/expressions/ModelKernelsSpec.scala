package graft.expressions

import graft.SparkSpec
import graft.cluster.Clustering
import graft.io.Tables
import graft.similarity.ArrayOps
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** Contracts of the r13 native model-application kernels (the UDF→codegen
  * ingest rewrites): fail-loud dimension checks (ADVICE r12 — the UDF forms
  * silently scored a prefix on mismatched widths), UDF-free plan shapes,
  * interpreted/codegen parity, sparse/dense projection parity, and the
  * Pq.search routed-delegation equivalence (VERDICT r12 #3).
  */
class ModelKernelsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))

  private lazy val cents = t.filter(col("vec_id") < 8)
    .select(col("vec_id").cast("int").as("centroid_id"), col("v").as("cvec"))

  test("fromCentroids rejects a corpus vector narrower than the centroids") {
    val bad = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "v") // dim 2 vs 64
    val ex = intercept[Exception] {
      graft.ann.Ivf.fromCentroids(bad, "v", cents).assigned.count()
    }
    assert(ex.getMessage != null &&
      ex.toString.concat(Option(ex.getCause).mkString).contains("centroid width") ||
      Option(ex.getCause).exists(_.getMessage.contains("centroid width")),
      s"expected a loud centroid-width error, got: $ex")
  }

  test("fromCentroids rejects a ragged centroid table at construction") {
    val ragged = Seq((0, Seq(1.0, 2.0)), (1, Seq(1.0, 2.0, 3.0)))
      .toDF("centroid_id", "cvec")
    val ex = intercept[IllegalArgumentException] {
      graft.ann.Ivf.fromCentroids(t, "v", ragged)
    }
    assert(ex.getMessage.contains("same positive length"))
  }

  test("fromCodebooks rejects a corpus vector that is not m*dsub wide") {
    val books = Array.tabulate(4, 2)((j, c) => Array(j + 0.0, c + 1.0)) // m=4, dsub=2
    val bad = Seq((0L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "v") // 3 != 8
    val ex = intercept[Exception] {
      graft.ann.Pq.fromCodebooks(bad, "vec_id", "v", books).codes.count()
    }
    assert(ex.toString.concat(Option(ex.getCause).mkString).contains("m*dsub") ||
      Option(ex.getCause).exists(_.getMessage.contains("m*dsub")),
      s"expected a loud m*dsub error, got: $ex")
  }

  test("projectRows rejects a dense vector shorter than the basis rows") {
    val basis = Array.fill(4 * 2)(0.5) // numFeatures=4, numConcepts=2
    val bad = Seq((0L, Vectors.dense(1.0, 2.0))).toDF("id", "features")
    val ex = intercept[Exception] {
      Clustering.projectRows(bad, basis, 4, 2).collect()
    }
    assert(ex.toString.concat(Option(ex.getCause).mkString).contains("basis rows") ||
      Option(ex.getCause).exists(_.getMessage.contains("basis rows")),
      s"expected a loud basis-rows error, got: $ex")
  }

  test("ingest plans carry native kernels, not Scala UDFs") {
    val asg = graft.ann.Ivf.fromCentroids(t, "v", cents).assigned
    val books = Array.tabulate(8, 3)((j, c) =>
      Array.tabulate(8)(i => (j * 8 + i) * 0.25 + c))
    val enc = graft.ann.Pq.fromCodebooks(t, "vec_id", "v", books).codes
    // vector input built in memory — array_to_vector is itself a UDF and
    // would trip the assertion without being part of projectRows' plan
    val vecIn = (0L until 10L)
      .map(i => (i, Vectors.dense(Array.tabulate(64)(j => (i + j) * 0.5))))
      .toDF("vec_id", "features")
      .repartition(2) // keep ConvertToLocalRelation from pre-evaluating the plan
    val proj = Clustering.projectRows(vecIn, Array.fill(64 * 3)(0.125), 64, 3)
    for ((name, df) <- Seq(("fromCentroids", asg), ("fromCodebooks", enc),
        ("projectRows", proj))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("UDF("), s"$name plan still carries a Scala UDF:\n$plan")
      assert(plan.contains("graft_"), s"$name plan lost the native kernel:\n$plan")
    }
  }

  test("interpreted eval matches codegen for all three kernels") {
    // the interpreted path (eval) and doGenCode are hand-written twins —
    // force the no-codegen factory and compare full outputs
    def run(): (Seq[(Long, Int)], Seq[(Long, Seq[Int])], Seq[(Long, Double)]) = {
      val a = graft.ann.Ivf.fromCentroids(t, "v", cents).assigned
        .select(col("vec_id"), col("centroid_id"))
        .as[(Long, Int)].collect().toSeq.sortBy(_._1)
      val books = Array.tabulate(8, 3)((j, c) =>
        Array.tabulate(8)(i => math.sin(j * 8 + i + c) * 2.0))
      val b = graft.ann.Pq.fromCodebooks(t, "vec_id", "v", books).codes
        .as[(Long, Seq[Int])].collect().toSeq.sortBy(_._1)
      val basis = Array.tabulate(64 * 3)(i => math.cos(i) * 0.5)
      val c = Clustering.projectRows(
        t.select(col("vec_id"),
          org.apache.spark.ml.functions.array_to_vector(col("v")).as("features")),
        basis, 64, 3)
        .select(col("vec_id"),
          org.apache.spark.ml.functions.vector_to_array(col("lsa_features")).as("p"))
        .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
        .map { case (id, p) => (id, p.sum) }
      (a, b, c)
    }
    val withCodegen = run()
    val factory = "spark.sql.codegen.factoryMode"
    val whole = "spark.sql.codegen.wholeStage"
    val (f0, w0) = (spark.conf.get(factory, "FALLBACK"), spark.conf.get(whole))
    try {
      spark.conf.set(factory, "NO_CODEGEN")
      spark.conf.set(whole, "false")
      assert(run() == withCodegen)
    } finally { spark.conf.set(factory, f0); spark.conf.set(whole, w0) }
  }

  test("projectRows treats sparse and dense inputs identically") {
    val dim = 16
    val dense = (0L until 20L).map { i =>
      val arr = Array.tabulate(dim)(j =>
        if ((i + j) % 3 == 0) 0.0 else (i * 31 + j * 7) % 13 - 6.0)
      (i, Vectors.dense(arr))
    }
    val sparse = dense.map { case (i, v) => (i, v.toSparse: org.apache.spark.ml.linalg.Vector) }
    val basis = Array.tabulate(dim * 4)(i => ((i * 17) % 19 - 9) * 0.25)
    def project(rows: Seq[(Long, org.apache.spark.ml.linalg.Vector)]): Map[Long, Seq[Double]] =
      Clustering.projectRows(rows.toDF("id", "features"), basis, dim, 4)
        .select(col("id"),
          org.apache.spark.ml.functions.vector_to_array(col("lsa_features")).as("p"))
        .as[(Long, Seq[Double])].collect().toMap
    val d = project(dense.map { case (i, v) => (i, v: org.apache.spark.ml.linalg.Vector) })
    val s = project(sparse)
    assert(d == s, "sparse/dense projection parity broken")
  }

  test("Pq.search with route delegates to IvfPq.search bit-for-bit") {
    val ivf = graft.ann.Ivf.fromCentroids(t, "v", cents)
    val books = Array.tabulate(8, 3)((j, c) =>
      Array.tabulate(8)(i => math.sin(j * 8 + i + c) * 2.0))
    val pq = graft.ann.Pq.fromCodebooks(t, "vec_id", "v", books)
    val probes = t.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val routed = graft.ann.Pq.search(pq, probes, topK = 5,
        route = Some((ivf, "vec_id")), nProbe = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val direct = graft.ann.IvfPq.search(ivf, pq, probes, "vec_id",
        topK = 5, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(routed == direct)
    // and route = None keeps the unrouted full-scan semantics (r12 shape)
    val unrouted = graft.ann.Pq.search(pq, probes, topK = 5)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(unrouted.map(_._1) == routed.map(_._1), "same probe set either way")
  }
}
