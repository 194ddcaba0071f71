package graft.post

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Post-processing of similarity-pair outputs — the library form of the
  * reference's Postprocessor / HarvestOutput / AnalysisUtils stage
  * (reference stats/AnalysisUtils.scala, utils/HarvestOutput.scala:25-26,
  * utils/Postprocessor.scala:34-38).
  */
object Post {

  /** S4: union sharded outputs via a glob path (the reference's 14-shard
    * harvest) — one scan, no driver loop. */
  def harvest(spark: SparkSession, glob: String): DataFrame =
    spark.read.parquet(glob)

  /** O1: global top-K pairs by similarity with a total order (deterministic
    * ties). Spark plans TakeOrderedAndProject — no full sort materialization. */
  def topK(pairs: DataFrame, k: Int): DataFrame =
    pairs.orderBy(desc("similarity"), asc("pk1"), asc("pk2")).limit(k)

  /** P5+O5: threshold then seeded Bernoulli sample (reference
    * AnalysisUtils.scala:89,98-104 — the count()+fraction two-pass replaced by
    * a direct fraction; exact row counts were never guaranteed there either). */
  def thresholdSample(pairs: DataFrame, minSimilarity: Double,
                      fraction: Double, seed: Long = 12345L): DataFrame =
    pairs.filter(col("similarity") >= minSimilarity).sample(fraction, seed)

  /** F7/F8: canonical pair ordering — order each pair by a token of the key
    * (the reference's state token, `pk.split("_")(tokenIndex)`), carrying any
    * payload columns along. Pure when/otherwise columns, no UDFs. */
  def imposeCanonicalOrder(pairs: DataFrame, tokenIndex: Int = 0): DataFrame = {
    val t1 = split(col("pk1"), "_").getItem(tokenIndex)
    val t2 = split(col("pk2"), "_").getItem(tokenIndex)
    val aFirst = t1 < t2 || (t1 === t2 && col("pk1") <= col("pk2"))
    pairs
      .withColumn("pk_smaller", when(aFirst, col("pk1")).otherwise(col("pk2")))
      .withColumn("pk_larger", when(aFirst, col("pk2")).otherwise(col("pk1")))
      .drop("pk1", "pk2")
  }

  /** S9: the "skim"/"light" JSON sink (reference docs/README.md:228-247) —
    * canonical-ordered pairs above a threshold as JSON lines. */
  def writeSkim(pairs: DataFrame, minSimilarity: Double, outPath: String): Unit =
    imposeCanonicalOrder(pairs.filter(col("similarity") >= minSimilarity))
      .write.mode(SaveMode.Overwrite).json(outPath)

  /** S10: single-file text dump (vocabulary, fit metrics) — the scale-safe
    * form of the reference's driver-side FileWriter (Utils.scala:223-227):
    * coalesce(1) only ever sees the (small) lines DataFrame, never the corpus. */
  def writeLines(spark: SparkSession, lines: Seq[String], outPath: String): Unit = {
    import spark.implicits._
    lines.toDF("value").coalesce(1).write.mode(SaveMode.Overwrite).text(outPath)
  }

  /** S11 artifact form: serialize a double column as the Histogrammar
    * Bin(n, lo, hi) JSON the reference plots from
    * (utils/Plot.scala:31 `input.histogrammar(Bin(10, 0, 100,
    * $"similarity")).toJsonFile(outputJson)`): low/high bounds, per-bin
    * counts, and the three flow counters, using Histogrammar's
    * `"<field>:type": "Count"` key convention. ONE map-side-combined
    * aggregation — the only driver-side bytes are the (nBins+3) counters,
    * so the writer is corpus-scale-safe by construction. */
  def histogramJson(df: DataFrame, valueCol: String,
                    nBins: Int, lo: Double, hi: Double): String = {
    val buf = df.select(graft.functions.Aggregators
        .histogram(nBins, lo, hi)(col(valueCol)).as("h"))
      .head.getSeq[Long](0)
    val values = buf.take(nBins)
    val entries = buf.sum
    s"""{"type":"Bin","data":{"low":$lo,"high":$hi,"entries":$entries,""" +
      s""""values:type":"Count","values":[${values.mkString(",")}],""" +
      s""""underflow:type":"Count","underflow":${buf(nBins)},""" +
      s""""overflow:type":"Count","overflow":${buf(nBins + 1)},""" +
      s""""nanflow:type":"Count","nanflow":${buf(nBins + 2)}}}"""
  }

  /** [[histogramJson]] to a file — the reference's toJsonFile. */
  def writeHistogramJson(df: DataFrame, valueCol: String, nBins: Int,
                         lo: Double, hi: Double, outPath: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      histogramJson(df, valueCol, nBins, lo, hi))
}
