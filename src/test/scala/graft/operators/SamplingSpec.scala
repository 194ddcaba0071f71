package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sampling surface beyond the deterministic modulo gate queries: the seeded
  * RNG forms (df.sample, df.stat.sampleBy, randomSplit) hit their configured
  * rates within tolerance and are reproducible under a fixed seed.
  * (Their exact row sets depend on partitioning/row order, which is why the
  * correctness gate uses modulo sampling — q_sample_mod/q_sample_stratified —
  * and the RNG forms are property-checked here instead.)
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (0 until 20000)
    .map(i => (i.toLong, if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "c"))
    .toDF("id", "stratum")

  test("stat.sampleBy: per-stratum rates within tolerance, seed-reproducible") {
    val fractions = Map("a" -> 0.1, "b" -> 0.5, "c" -> 0.9)
    val sampled = rows.stat.sampleBy("stratum", fractions, seed = 42L)
    val got = sampled.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    val base = rows.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    for ((k, f) <- fractions) {
      val rate = got.getOrElse(k, 0L).toDouble / base(k)
      assert(math.abs(rate - f) < 0.05, s"stratum $k: rate $rate vs $f")
    }
    val again = rows.stat.sampleBy("stratum", fractions, seed = 42L)
      .agg(count(lit(1)), sum("id")).head()
    val first = sampled.agg(count(lit(1)), sum("id")).head()
    assert(first == again, "same seed must reproduce the same sample")
  }

  test("sample(): Bernoulli rate within tolerance; randomSplit partitions " +
      "are disjoint and exhaustive") {
    val n = rows.sample(withReplacement = false, 0.2, seed = 7L).count()
    assert(math.abs(n / 20000.0 - 0.2) < 0.03, s"rate ${n / 20000.0}")
    val Array(tr, cv) = rows.randomSplit(Array(0.75, 0.25), seed = 7L)
    assert(tr.count() + cv.count() == 20000L)
    assert(tr.join(cv, "id").count() == 0L, "splits overlap")
  }
}
