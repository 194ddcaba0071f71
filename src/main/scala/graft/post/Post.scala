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
}
