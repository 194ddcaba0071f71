package graft.text

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._

/** Configurable TF(-IDF) feature pipeline (SURVEY M1-M7). */
class FeaturePipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog every single morning"),
    (2L, "the lazy dog sleeps while the quick brown fox keeps jumping around"),
    (3L, "completely unrelated legal document about taxation revenue statutes")
  ).toDF("doc_id", "text")

  test("HashingTF+IDF path produces nonzero sparse vectors of declared size") {
    val out = FeaturePipeline.features(docs, FeatureConfig(numTextFeatures = 256))
    val vecs = out.select("features").collect().map(_.getAs[Vector](0))
    assert(vecs.length == 3)
    assert(vecs.forall(_.size == 256))
    assert(vecs.forall(_.numNonzeros > 0))
    // intermediate columns dropped
    assert(out.columns.toSet == Set("doc_id", "text", "features"))
  }

  test("CountVectorizer path respects vocabLimit and exposes vocabulary") {
    val (model, out) = FeaturePipeline.fitTransform(docs,
      FeatureConfig(useCountVectorizer = true, vocabLimit = 10, useIdf = false))
    val vocab = FeaturePipeline.vocabulary(model)
    assert(vocab.isDefined && vocab.get.length <= 10)
    val vecs = out.select("features").collect().map(_.getAs[Vector](0))
    assert(vecs.forall(_.size == vocab.get.length))
  }

  test("n-gram features change the term space") {
    val uni = FeaturePipeline.features(docs,
      FeatureConfig(numTextFeatures = 256, useIdf = false))
    val tri = FeaturePipeline.features(docs,
      FeatureConfig(numTextFeatures = 256, useIdf = false,
        addNGramFeatures = true, nGramGranularity = 3))
    val u = uni.select("features").head().getAs[Vector](0)
    val t = tri.select("features").head().getAs[Vector](0)
    assert(u.numNonzeros != t.numNonzeros || u.toArray.toSeq != t.toArray.toSeq)
  }

  test("IDF downweights terms present in all docs") {
    val (_, out) = FeaturePipeline.fitTransform(docs,
      FeatureConfig(useCountVectorizer = true, vocabLimit = 64))
    // "quick" appears in 2 docs, taxation in 1 → idf(taxation) > idf(quick) > idf(term in all)
    val vecs = out.orderBy("doc_id").select("features").collect().map(_.getAs[Vector](0))
    assert(vecs.forall(v => v.toArray.forall(_ >= 0.0)))
  }

  test("stemming-free pipeline is deterministic across fits") {
    val a = FeaturePipeline.features(docs, FeatureConfig(numTextFeatures = 128))
      .select("features").collect().map(_.getAs[Vector](0).toArray.toSeq)
    val b = FeaturePipeline.features(docs, FeatureConfig(numTextFeatures = 128))
      .select("features").collect().map(_.getAs[Vector](0).toArray.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
