package graft.post

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Post-processing stage: harvest, top-K, canonical order, skim sink. */
class PostSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = Seq(
    ("NJ_2005_A1", "FL_2005_B2", 91.5),
    ("FL_2005_B9", "SC_2005_C3", 88.0),
    ("SC_2005_C3", "FL_2005_B9", 88.0), // symmetric dup, different order
    ("AL_2005_D4", "NJ_2005_A1", 10.0)
  ).toDF("pk1", "pk2", "similarity")

  test("topK returns deterministic global top pairs") {
    val got = Post.topK(pairs, 2).as[(String, String, Double)].collect()
    assert(got.length == 2)
    assert(got(0)._3 == 91.5)
    assert(got(1)._3 == 88.0)
  }

  test("imposeCanonicalOrder orders by key token then key") {
    val got = Post.imposeCanonicalOrder(pairs)
      .select("pk_smaller", "pk_larger").as[(String, String)].collect().toSet
    assert(got.contains(("FL_2005_B2", "NJ_2005_A1"))) // FL < NJ
    assert(got.contains(("FL_2005_B9", "SC_2005_C3")))
    assert(got.contains(("AL_2005_D4", "NJ_2005_A1")))
    // the symmetric duplicate maps to the SAME canonical pair
    assert(Post.imposeCanonicalOrder(pairs).dropDuplicates("pk_smaller", "pk_larger")
      .count() == 3)
  }

  test("thresholdSample filters then samples with a fixed seed (deterministic)") {
    val a = Post.thresholdSample(pairs, 50.0, 1.0).count()
    assert(a == 3) // fraction 1.0 keeps all above-threshold rows
    val s1 = Post.thresholdSample(pairs, 0.0, 0.5, seed = 7).count()
    val s2 = Post.thresholdSample(pairs, 0.0, 0.5, seed = 7).count()
    assert(s1 == s2)
  }

  test("writeSkim round-trips as JSON; harvest unions shards via glob") {
    val dir = Files.createTempDirectory("graft-post").toString
    Post.writeSkim(pairs, 50.0, s"$dir/skim")
    val back = spark.read.json(s"$dir/skim")
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("pk_smaller", "pk_larger", "similarity"))

    // sharded parquet dirs → one glob scan
    pairs.limit(2).write.parquet(s"$dir/shard_p0")
    pairs.limit(1).write.parquet(s"$dir/shard_p1")
    assert(Post.harvest(spark, s"$dir/shard_p*").count() == 3)
  }

  test("histogramJson emits the golden Histogrammar Bin shape") {
    // 10 bins over [0,100): 5 → bin 0, 55/60 → bins 5 and 6, -1 underflow,
    // 100 overflow (hi-exclusive), NaN nanflow — entries counts all 6
    val vals = Seq(5.0, 55.0, 60.0, -1.0, 100.0, Double.NaN).toDF("similarity")
    val got = Post.histogramJson(vals, "similarity", nBins = 10, lo = 0.0, hi = 100.0)
    val golden =
      """{"type":"Bin","data":{"low":0.0,"high":100.0,"entries":6,""" +
        """"values:type":"Count","values":[1,0,0,0,0,1,1,0,0,0],""" +
        """"underflow:type":"Count","underflow":1,""" +
        """"overflow:type":"Count","overflow":1,""" +
        """"nanflow:type":"Count","nanflow":1}}"""
    assert(got == golden)

    val dir = Files.createTempDirectory("graft-hist").toString
    Post.writeHistogramJson(vals, "similarity", 10, 0.0, 100.0, s"$dir/hist.json")
    assert(Files.readString(java.nio.file.Paths.get(s"$dir/hist.json")) == golden)
  }

  test("writeLines produces a single text file") {
    val dir = Files.createTempDirectory("graft-vocab").toString
    Post.writeLines(spark, Seq("alpha", "beta"), s"$dir/vocab")
    val files = new java.io.File(s"$dir/vocab").listFiles()
      .filter(_.getName.endsWith(".txt"))
    assert(files.length == 1)
    assert(spark.read.text(s"$dir/vocab").count() == 2)
  }
}
