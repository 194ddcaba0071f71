package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Typed Aggregators (SURVEY A3/A4/A9 on Spark-4 Aggregator API). */
class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("vectorSum: element-wise sum across a group") {
    val df = Seq(
      ("a", Seq(1.0, 2.0, 3.0)),
      ("a", Seq(10.0, 20.0, 30.0)),
      ("b", Seq(5.0, 5.0, 5.0))
    ).toDF("k", "v")
    val got = df.groupBy("k").agg(Aggregators.vectorSum(col("v")).as("s"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("a") == Seq(11.0, 22.0, 33.0))
    assert(got("b") == Seq(5.0, 5.0, 5.0))
  }

  test("vectorSum: null rows skipped, ragged lengths grow the buffer") {
    val df = Seq(
      ("a", Some(Seq(1.0))),
      ("a", None),
      ("a", Some(Seq(1.0, 2.0)))
    ).toDF("k", "v")
    val got = df.groupBy("k").agg(Aggregators.vectorSum(col("v")).as("s"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("a") == Seq(2.0, 2.0))
  }

  test("histogram: bins + underflow/overflow/nan buckets") {
    val df = Seq(-1.0, 0.0, 0.5, 4.9, 5.0, 10.0, 99.0, Double.NaN).toDF("x")
    // 5 bins over [0, 5): width 1
    val got = df.agg(Aggregators.histogram(5, 0.0, 5.0)(col("x")).as("h"))
      .as[Seq[Long]].head()
    assert(got.length == 8)
    assert(got(0) == 2)            // 0.0, 0.5
    assert(got(4) == 1)            // 4.9
    assert(got(5) == 1)            // underflow: -1
    assert(got(6) == 3)            // overflow: 5.0, 10, 99
    assert(got(7) == 1)            // nan
    assert(got.sum == 8)
  }

  test("histogram: merge across partitions preserves totals") {
    val df = spark.range(0, 10000).repartition(8)
      .select((col("id") % 100).cast("double").as("x"))
    val got = df.agg(Aggregators.histogram(10, 0.0, 100.0)(col("x")).as("h"))
      .as[Seq[Long]].head()
    assert(got.take(10).forall(_ == 1000L))
    assert(got.drop(10).forall(_ == 0L))
  }

  test("misraGries: guarantee — every key above N/(k+1) survives the sketch") {
    // zipf-ish stream: key i appears 2^(10-i) times, shuffled across 8
    // partitions so reduce AND merge paths both run under real eviction
    // (k=3 counters, 10 distinct keys)
    val rows = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"k$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("w")
    val n = rows.size
    val k = 3
    val cands = df.agg(Aggregators.misraGries(k)(col("w")).as("c"))
      .as[Seq[String]].head().toSet
    assert(cands.size <= k)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavy = exact.collect { case (w, c) if c * (k + 1) > n => w }.toSet
    assert(heavy.nonEmpty, "fixture must contain a true heavy hitter")
    assert(heavy.subsetOf(cands),
      s"MG summary $cands must contain all heavy hitters $heavy")
  }

  test("misraGries: candidate recount equals exact heavy hitters (q_freq_items shape)") {
    val rows = Seq.fill(600)("en") ++ Seq.fill(150)("de") ++
      Seq.fill(140)("fr") ++ Seq.fill(60)("es") ++ Seq.fill(50)("zh")
    val df = spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 8).toDF("w")
    val k = 4
    val cands = df.agg(Aggregators.misraGries(k)(col("w")).as("c"))
      .as[Seq[String]].head().toSet
    val n = rows.size
    val viaSketch = df.groupBy("w").count()
      .filter(col("w").isin(cands.toSeq: _*) && col("count") * (k + 1) > n)
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * (k + 1) > n }
    assert(viaSketch == exact)
  }

  test("topK equals the window form across partitions, ties to smaller id") {
    // 8 partitions force real partial/merge paths; duplicate scores force
    // the deterministic tie-break
    val df = spark.range(0, 5000).repartition(8)
      .select((col("id") % 7).cast("string").as("k"),
        (col("id") % 50).cast("double").as("score"),
        col("id").as("id"))
    val got = df.groupBy("k")
      .agg(Aggregators.topK(5)(col("score"), col("id")).as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("score").desc, col("id").asc)
    val expected = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .orderBy("k", "rn")
      .as[(String, Double, Long, Int)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    assert(got == expected && got.values.forall(_.length == 5))
  }

  test("topK with fewer rows than k returns all, ranked") {
    val df = Seq(("a", 1.0, 10L), ("a", 3.0, 11L), ("b", 2.0, 12L))
      .toDF("k", "score", "id")
    val got = df.groupBy("k")
      .agg(Aggregators.topK(5)(col("score"), col("id")).as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got == Map("a" -> Seq(11L, 10L), "b" -> Seq(12L)))
  }

  test("topKScored equals the window form with scores kept (ANN search shape)") {
    val df = spark.range(0, 5000).repartition(8)
      .select((col("id") % 7).cast("string").as("k"),
        (col("id") % 50).cast("double").as("score"),
        col("id").as("id"))
    val got = df.groupBy("k")
      .agg(Aggregators.topKScored(5)(col("score"), col("id")).as("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("score").desc, col("id").asc)
    val expected = df
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .orderBy("k", "rn")
      .as[(String, Double, Long, Int)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap
    assert(got == expected)
  }

  test("bottomKByKey equals the window form across partitions (md5-race shape)") {
    // 8 partitions force real partial/merge paths; the md5 key reproduces
    // the q_sample_pergroup hash-race ordering exactly (full string compare)
    val df = spark.range(0, 4000).repartition(8)
      .select((col("id") % 5).cast("string").as("g"),
        md5(col("id").cast("string").cast("binary")).as("h"),
        col("id").as("id"))
    val got = df.groupBy("g")
      .agg(Aggregators.bottomKByKey(3)(col("h"), col("id")).as("bot"))
      .as[(String, Seq[(String, Long)])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("h").asc, col("id").asc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).orderBy("g", "rn")
      .as[(String, String, Long, Int)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3))).toMap
    assert(got == expected)
    assert(got.values.forall(v => v.length == 3 && v == v.sorted))
  }

  test("bottomKByKey orders keys as UTF-8 bytes, like a string ORDER BY") {
    // U+10000 (4-byte F0 90 80 80) sorts AFTER U+FFFF (EF BF BF) in UTF-8
    // binary order but BEFORE it in UTF-16 code-unit order — the window
    // (UTF8String compare) and the aggregator must agree on the former
    val df = Seq(("g", "𐀀", 1L), ("g", "￿", 2L), ("g", "a", 3L))
      .toDF("g", "h", "id")
    val got = df.groupBy("g")
      .agg(Aggregators.bottomKByKey(2)(col("h"), col("id")).as("bot"))
      .as[(String, Seq[(String, Long)])].collect().head._2
    val exp = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("h").asc, col("id").asc)))
      .filter(col("rn") <= 2).orderBy("rn")
      .as[(String, String, Long, Int)].collect().toSeq.map(r => (r._2, r._3))
    assert(got === exp)
    assert(got.map(_._2) === Seq(3L, 2L)) // "a", then U+FFFF; U+10000 last
  }

  test("bottomKByKey with fewer rows than k returns all, ordered") {
    val df = Seq(("a", "zz", 1L), ("a", "aa", 2L), ("b", "mm", 3L))
      .toDF("g", "h", "id")
    val got = df.groupBy("g")
      .agg(Aggregators.bottomKByKey(5)(col("h"), col("id")).as("bot"))
      .as[(String, Seq[(String, Long)])].collect().toMap
    assert(got == Map("a" -> Seq(("aa", 2L), ("zz", 1L)), "b" -> Seq(("mm", 3L))))
  }
}
