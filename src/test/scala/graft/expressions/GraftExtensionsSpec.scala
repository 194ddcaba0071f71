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
}
