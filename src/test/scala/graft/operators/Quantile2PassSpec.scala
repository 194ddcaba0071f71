package graft.operators

import graft.SparkSpec

/** Exact rank-k selection via histogram bracketing: must equal the sorted
  * array's k-th element on every rank, including under heavy value skew
  * (one value owning most of the mass forces the all-equal base case) and
  * with a tiny maxTake (forces the recursion path). */
class Quantile2PassSpec extends SparkSpec {
  import spark.implicits._

  private def check(values: Seq[Double], ranks: Seq[Long],
                    nBins: Int = 16, maxTake: Int = 4): Unit = {
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val sorted = values.sorted
    for (k <- ranks) {
      val got = Quantile2Pass.kthSmallest(df, "v", k, nBins, maxTake)
      assert(got == sorted((k - 1).toInt), s"rank $k: got $got")
    }
  }

  test("matches sorted-array selection on mixed values, every rank") {
    val vs = Seq(5.5, -3.25, 17.0, 0.0, 2.5, 2.5, 99.0, -3.25, 8.125, 1.0)
    check(vs, 1L to vs.size.toLong)
  }

  test("heavy skew: one dominant value, recursion + all-equal base case") {
    val vs = Seq.fill(200)(42.0) ++ Seq(-1.0, 0.5, 43.0, 1000.0)
    check(vs, Seq(1L, 2L, 3L, 50L, 150L, 203L, 204L))
  }

  test("all-equal column short-circuits") {
    check(Seq.fill(10)(7.0), Seq(1L, 5L, 10L))
  }

  test("median of lineitem equals exact percentile") {
    val li = graft.io.Tables.lineitem(spark, sfDir)
    val n = li.count()
    val k = (n + 1) / 2
    val got = Quantile2Pass.kthSmallest(li, "l_extendedprice", k)
    val want = li.select("l_extendedprice").as[Double].collect().sorted
      .apply((k - 1).toInt)
    assert(got == want)
  }
}
