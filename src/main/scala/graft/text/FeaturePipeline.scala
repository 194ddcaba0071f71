package graft.text

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Configurable text→TF(-IDF) feature pipeline — the engine's equivalent of
  * the reference's `Utils.extractFeatures` chain (reference
  * feature/Utils.scala:181-242): clean → tokenize → stopwords → [n-grams] →
  * HashingTF | CountVectorizer → [IDF].
  *
  * Differences from the reference, on purpose:
  *  - cleaning is a Column expression (TextOps.clean), not a UDF;
  *  - stemming (external spark-stemming jar, Utils.scala:200-204) is served
  *    by in-repo clean-room stemmers: classic Porter (1980) or Snowball /
  *    Porter2 English — the algorithm that jar actually ran — selected via
  *    `stemmerAlgorithm`;
  *  - all stages are the stock Spark ML transformers, so the fitted
  *    PipelineModel is save/load-able and its transform is codegen-friendly.
  *
  * Scale: HashingTF is stateless (no fit job, no vocab broadcast) — the right
  * default at 100 TB. CountVectorizer (vocab dump, reference Utils.scala:218-230)
  * is the opt-in for interpretability; its fit is one aggregation job and the
  * vocabulary broadcast is bounded by `vocabLimit`.
  */
final case class FeatureConfig(
    inputCol: String = "text",
    outputCol: String = "features",
    numTextFeatures: Int = 4096,
    addNGramFeatures: Boolean = false,
    nGramGranularity: Int = 5,
    useCountVectorizer: Boolean = false,
    vocabLimit: Int = 1 << 16,
    useIdf: Boolean = true,
    minDocFreq: Int = 1,
    useStemming: Boolean = false,
    stemmerAlgorithm: String = "porter", // "porter" | "snowball" (Porter2)
    extraStopWords: Seq[String] = Nil)

object FeaturePipeline {

  /** The reference ships 104 extra stopwords (state names/demonyms/ordinals,
    * stopwords/extra.txt); domain-neutral default here, callers add their own. */
  val defaultExtraStopWords: Seq[String] = Seq.empty

  def build(cfg: FeatureConfig): Pipeline = {
    val tokenizer = new RegexTokenizer()
      .setInputCol("__clean").setOutputCol("__tokens")
      .setPattern("\\W")
    val stopper = new StopWordsRemover()
      .setInputCol("__tokens").setOutputCol("__filtered")
      .setStopWords(StopWordsRemover.loadDefaultStopWords("english")
        ++ cfg.extraStopWords)
    val stemmed = if (cfg.useStemming) "__stemmed" else "__filtered"
    val stemmer = new StemmerStage()
      .setInputCol("__filtered").setOutputCol("__stemmed")
      .setAlgorithm(cfg.stemmerAlgorithm)
    val termsCol =
      if (cfg.addNGramFeatures) {
        "__ngrams"
      } else stemmed
    val ngram = new NGram()
      .setN(cfg.nGramGranularity)
      .setInputCol(stemmed).setOutputCol("__ngrams")
    val vectorize =
      if (cfg.useCountVectorizer)
        new CountVectorizer()
          .setInputCol(termsCol).setOutputCol(if (cfg.useIdf) "__tf" else cfg.outputCol)
          .setVocabSize(cfg.vocabLimit)
      else
        new HashingTF()
          .setInputCol(termsCol).setOutputCol(if (cfg.useIdf) "__tf" else cfg.outputCol)
          .setNumFeatures(cfg.numTextFeatures)
    val stages = Seq(tokenizer, stopper) ++
      (if (cfg.useStemming) Seq(stemmer) else Nil) ++
      (if (cfg.addNGramFeatures) Seq(ngram) else Nil) ++
      Seq(vectorize) ++
      (if (cfg.useIdf)
        Seq(new IDF().setInputCol("__tf").setOutputCol(cfg.outputCol)
          .setMinDocFreq(cfg.minDocFreq))
      else Nil)
    new Pipeline().setStages(stages.toArray)
  }

  /** Fit + transform, returning the input columns plus `cfg.outputCol`
    * (intermediate __-prefixed columns dropped). */
  def features(df: DataFrame, cfg: FeatureConfig): DataFrame =
    fitTransform(df, cfg)._2

  def fitTransform(df: DataFrame, cfg: FeatureConfig): (PipelineModel, DataFrame) = {
    val cleaned = df.withColumn("__clean",
      TextOps.dropSmallWords(TextOps.clean(col(cfg.inputCol))))
    val model = build(cfg).fit(cleaned)
    val out = model.transform(cleaned)
      .drop("__clean", "__tokens", "__filtered", "__stemmed", "__ngrams", "__tf")
    (model, out)
  }

  /** Vocabulary of a fitted CountVectorizer stage (reference dumps this to
    * vocab.dat, Utils.scala:223-227). */
  def vocabulary(model: PipelineModel): Option[Array[String]] =
    model.stages.collectFirst { case cv: CountVectorizerModel => cv.vocabulary }
}
