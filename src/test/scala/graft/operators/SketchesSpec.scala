package graft.operators

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Probabilistic-sketch surface: bloom-prefiltered join exactness, HLL++
  * cardinality error bounds, approx-percentile rank accuracy, count-min
  * overcount-only guarantee.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered join result equals the plain join (long key)") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val urgent = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val plain = li.join(urgent, "l_orderkey")
      .as[(Long, Double, String)].collect().sorted.toSeq
    val bloomed = BloomPrefilter.join(li, urgent, "l_orderkey",
        expected = 10000L, fpp = 0.01)
      .as[(Long, Double, String)].collect().sorted.toSeq
    assert(plain.nonEmpty && bloomed == plain)
  }

  test("bloom-prefiltered join works on string keys too") {
    val docs = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4)).toDF("k", "v")
    val keep = Seq(("b", "x"), ("d", "y")).toDF("k", "tag")
    val got = BloomPrefilter.join(docs, keep, "k", expected = 10, fpp = 0.01)
      .as[(String, Int, String)].collect().toSet
    assert(got == Set(("b", 2, "x"), ("d", 4, "y")))
  }

  test("HLL++ approx distinct lands within the configured error band") {
    val exact = Tables.events(spark, sfDir)
      .select(countDistinct($"user_id")).as[Long].head()
    val approx = Tables.events(spark, sfDir)
      .select(approx_count_distinct($"user_id", 0.02)).as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.08, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("Datasketches HLL: slice-merged estimate equals direct, within band of exact") {
    // the q_hll_merge gate certifies boolean flags against the DuckDB oracle;
    // this spec keeps the ESTIMATE-level contract: register-max merging makes
    // merged ≡ direct exactly, and at lgK=14 the direct estimate sits within
    // 3·rsd (≈2.4%) of the exact distinct count on every event_type
    val e = Tables.events(spark, sfDir)
    val merged = e.withColumn("slice", $"event_id" % 8)
      .groupBy("event_type", "slice")
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("m"))
    val direct = e.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", lit(14))).as("dd"),
        countDistinct($"user_id").as("ex"))
    val rows = merged.join(direct, "event_type")
      .as[(String, Double, Double, Long)].collect()
    assert(rows.length >= 2)
    rows.foreach { case (t, m, dd, ex) =>
      assert(m == dd, s"$t: merged=$m direct=$dd — union must be lossless")
      assert(math.abs(dd - ex) <= 3 * 0.0082 * ex, s"$t: direct=$dd exact=$ex")
    }
  }

  test("approx percentile is rank-accurate to the accuracy parameter") {
    val vals = Tables.lineitem(spark, sfDir)
      .select($"l_extendedprice").as[Double].collect().sorted
    val n = vals.length
    val approxMedian = Tables.lineitem(spark, sfDir)
      .select(percentile_approx($"l_extendedprice", lit(0.5), lit(1000)))
      .as[Double].head()
    // guarantee: result is a true element whose rank is within n/accuracy
    // of the target rank
    val rank = vals.count(_ <= approxMedian).toDouble / n
    assert(math.abs(rank - 0.5) < 0.01, s"median rank off: $rank")
  }

  test("count-min sketch never undercounts and overcount is bounded") {
    val df = Tables.events(spark, sfDir).select("event_type")
    val exact = df.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val total = exact.values.sum
    val cms = df.stat.countMinSketch("event_type", eps = 0.001,
      confidence = 0.99, seed = 42)
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"undercount for $k: $est < $n")
      assert(est <= n + (0.001 * total).toLong + 1,
        s"overcount beyond eps*N for $k: $est vs $n")
    }
  }
}
