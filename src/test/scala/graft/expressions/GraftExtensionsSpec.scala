package graft.expressions

import graft.SparkSpec

/** graft's native expressions are reachable from plain SQL through the
  * spark.sql.extensions entry point (GraftSession sets it by default). */
class GraftExtensionsSpec extends SparkSpec {

  test("kernel functions callable from spark.sql") {
    val r = spark.sql("""
      SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
             graft_l1(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS l1,
             graft_cosine_parts(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS parts,
             graft_support_stats(array(1.0D, 0.0D), array(1.0D, 1.0D), 0.5) AS stats
    """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 4.0)
    assert(r.getSeq[Double](2) == Seq(25.0, 25.0, 25.0))
    assert(r.getSeq[Long](3) == Seq(1L, 2L, 1L, 1L))
  }

  test("text functions callable from spark.sql") {
    val r = spark.sql("""
      SELECT graft_ngrams(array('a','b','c'), 2) AS grams,
             graft_porter_stem('relational') AS stem,
             graft_simhash64(array(0L)) AS sig
    """).head()
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getString(1) == "relat")
    assert(r.getLong(2) == 0L)
  }

  test("tokenizer / token-count / minhash functions callable from spark.sql") {
    val r = spark.sql("""
      SELECT graft_tokens('  a  b   c ') AS toks,
             graft_bpeish_count('hello world') AS n,
             graft_minhash_sig(array(5L, 99L), 4) AS sig
    """).head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r.getInt(1) > 0)
    val sig = r.getSeq[Long](2)
    assert(sig.length == 4 && sig.forall(s => s >= 0 && s < (1L << 31) - 1))
    // SQL signature == library signature (same md5-derived coefficients)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val lib = Seq(Seq(5L, 99L)).toDF("h")
      .select(graft.dedup.MinHashDedup.signature(col("h"), 4))
      .head().getSeq[Long](0)
    assert(sig == lib)
  }

  test("graft_jaccard: set semantics, duplicates collapsed, empty = 0") {
    val r = spark.sql("""
      SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j1,
             graft_jaccard(array(1L, 1L, 2L), array(2L, 2L, 1L)) AS dups,
             graft_jaccard(array(), array()) AS empty,
             graft_jaccard(array(1L), array(2L)) AS disjoint
    """).head()
    assert(r.getDouble(0) == 2.0 * 100.0 / 4.0)
    assert(r.getDouble(1) == 100.0) // {1,2} vs {2,1}
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0)
  }

  test("JaccardPrefilter rule injects the size-ratio bound under a " +
      "threshold filter on the distinct-marked kernel, without changing results") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L), Seq(1L, 2L, 3L, 4L)),   // jac 80
      (2L, Seq(1L, 2L), Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)), // lopsided
      (3L, Seq(7L, 8L), Seq(9L, 10L))                        // jac 0
    ).toDF("id", "a", "b")
    // a file-backed leaf: ConvertToLocalRelation would otherwise evaluate
    // the whole filter at optimization time and leave no plan to inspect
    val dir = java.nio.file.Files.createTempDirectory("graft_jac").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("jac_in")
    val q = spark.sql(
      "SELECT id FROM jac_in WHERE graft_jaccard_sets(a, b) >= 70.0")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("size("), s"size guard not injected:\n$opt")
    assert(q.as[Long].collect().toSeq == Seq(1L))
    // guard is a pure prune: a pair it rejects (id=2: 2·100 < 70·10) has
    // jac = 2/10 = 20 < 70 anyway; results identical with the rule active
    val manual = df.filter(expr("graft_jaccard_sets(a, b)") >= 70.0)
      .select("id").as[Long].collect().toSeq
    assert(manual == Seq(1L))
  }

  test("unmarked graft_jaccard gets NO size guard — duplicate-bearing rows " +
      "that qualify are kept, not optimized away") {
    import spark.implicits._
    // jac({1},{1}) = 100 but raw sizes are 4 vs 1: the raw-size guard would
    // wrongly reject this row at t=50; the documented SQL function must keep it
    val dup = Seq((1L, Seq(1L, 1L, 1L, 1L), Seq(1L))).toDF("id", "a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_jac_dup").toString
    dup.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("jac_dup")
    val q = spark.sql(
      "SELECT id FROM jac_dup WHERE graft_jaccard(a, b) >= 50.0")
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("size("), s"guard must not fire on unmarked kernel:\n$opt")
    assert(q.as[Long].collect().toSeq == Seq(1L))
  }
}
