package graft.queries

import graft.QueryDef
import graft.candidates.{CandidateConfig, Candidates}
import graft.cluster.Clustering
import graft.dedup.{MinHashDedup, SimHash}
import graft.io.Tables
import graft.linalg.Dimsum
import graft.lsh.LshJoins
import graft.similarity.Kernels
import graft.text.{FeatureConfig, FeaturePipeline}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML-surface operators (SURVEY §2.9, M1-M13) on the `documents` corpus (the
  * bills-table stand-in) — feature extraction, clustering/topics/LSA blocking,
  * LSH joins, DIMSUM, MinHash/SimHash dedup, and the flagship end-to-end
  * bill-match pipeline. Seeds fixed; oracle is rows-only (DuckDB has no ML
  * analogue) — semantic checks live in the ScalaTest suites.
  */
object MlQueries {

  private val tfidfCfg = FeatureConfig(numTextFeatures = 1024)

  private val featCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** documents → (doc_id, lang, n_chars, features) with TF-IDF features.
    * Cached per (session, dir): the k-means fit, the candidate self-join, and
    * the pair→vector joins all reuse this frame — without the cache the whole
    * clean→tokenize→TF→IDF lineage recomputes on every reuse (the reference
    * cached its features parquet for the same reason,
    * ExtractCandidates.scala:106). */
  private def featurized(s: SparkSession, d: String): DataFrame =
    featCache.getOrElseUpdate((s, d),
      FeaturePipeline.features(Tables.documents(s, d), tfidfCfg)
        .select("doc_id", "lang", "n_chars", "features")
        .cache())

  val defs: Map[String, QueryDef] = Map(

    // ----- M1/M2/M5/M7: clean→tokenize→stopwords→HashingTF→IDF
    "q_tfidf_features" -> QueryDef.rowsOnly { (s, d) =>
      val numNonzeros = udf((v: Vector) => v.numNonzeros)
      featurized(s, d)
        .select(col("doc_id"), numNonzeros(col("features")).as("nnz"))
        .orderBy("doc_id")
    },

    // ----- M6: CountVectorizer path with bounded vocabulary
    "q_count_vectorized" -> QueryDef.rowsOnly { (s, d) =>
      val cfg = FeatureConfig(useCountVectorizer = true, vocabLimit = 512, useIdf = false)
      val numNonzeros = udf((v: Vector) => v.numNonzeros)
      FeaturePipeline.features(Tables.documents(s, d), cfg)
        .select(col("doc_id"), numNonzeros(col("features")).as("nnz"))
        .orderBy("doc_id")
    },

    // ----- M8: k-means blocking labels (reference Utils.scala:129-149)
    "q_kmeans_blocks" -> QueryDef.rowsOnly { (s, d) =>
      val (_, clustered) = Clustering.kmeans(featurized(s, d), k = 8, maxIter = 20)
      clustered.groupBy("prediction").agg(count(lit(1)).as("n"))
        .orderBy("prediction")
    },

    // ----- M9: LDA topics (reference LDAAnalyzer.scala:85-116)
    // Scalar columns only: the driver's pandas compare cannot sort array
    // cells (round-1 q_lda_topics crash), so explode term indices to rows.
    "q_lda_topics" -> QueryDef.rowsOnly { (s, d) =>
      val (model, _) = Clustering.lda(featurized(s, d), k = 5, maxIter = 10)
      model.describeTopics(5)
        .select(col("topic"), posexplode(col("termIndices")).as(Seq("pos", "term_index")))
        .orderBy("topic", "pos")
    },

    // ----- M10: key-preserving LSA projection (fixes SURVEY J6)
    "q_lsa_project" -> QueryDef.rowsOnly { (s, d) =>
      val norm2 = udf((v: Vector) => math.sqrt(v.toArray.map(x => x * x).sum))
      Clustering.lsaProject(featurized(s, d), numConcepts = 16)
        .select(col("doc_id"), norm2(col("lsa_features")).as("lsa_norm"))
        .orderBy("doc_id")
    },

    // ----- M11/J3: MinHash LSH self-join + asymmetric keyDistance recompute
    "q_minhash_lsh" -> QueryDef.rowsOnly { (s, d) =>
      val tf = FeaturePipeline.features(Tables.documents(s, d),
        FeatureConfig(numTextFeatures = 1024, useIdf = false))
        .select("doc_id", "features")
      LshJoins.minHashSelfJoin(tf, "doc_id", "features", threshold = 0.6)
        .orderBy("pk1", "pk2")
    },

    // ----- M12: bucketed random-projection LSH on embeddings
    "q_brp_lsh" -> QueryDef.rowsOnly { (s, d) =>
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id"),
          org.apache.spark.ml.functions.array_to_vector(col("embedding")).as("features"))
      LshJoins.brpSelfJoin(vecs, "vec_id", "features",
        threshold = 1.0, bucketLength = 0.5)
        .orderBy("pk1", "pk2")
    },

    // ----- M13/J10: DIMSUM sampled cosine all-pairs
    "q_dimsum" -> QueryDef.rowsOnly { (s, d) =>
      Dimsum.docSimilarities(featurized(s, d), "doc_id", "features", threshold = 0.3)
        .filter(col("cos_sim") >= 0.5)
        .orderBy("d1", "d2")
    },

    // ----- extension: MinHash banded-LSH near-dup detection (pure columns)
    "q_minhash_dedup" -> QueryDef.rowsOnly { (s, d) =>
      MinHashDedup.nearDupPairs(Tables.documents(s, d),
        MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.7))
        .orderBy("d1", "d2")
    },

    // ----- extension: SimHash near-dup detection
    "q_simhash_dedup" -> QueryDef.rowsOnly { (s, d) =>
      SimHash.nearDupPairs(Tables.documents(s, d),
        SimHash.Config(maxHammingDistance = 3))
        .orderBy("d1", "d2")
    },

    // ----- J2 full form: blocked candidate pairs on a clustered corpus
    "q_candidates" -> QueryDef.rowsOnly { (s, d) =>
      val (_, clustered) = Clustering.kmeans(featurized(s, d), k = 8, maxIter = 20)
      Candidates.pairs(clustered, CandidateConfig(
        keyCol = "doc_id", groupCol = "lang",
        blockCol = Some("prediction"),
        lengthCol = Some("n_chars"), maxLengthRatio = 0.26))
        .orderBy("pk1", "pk2")
    },

    // ----- flagship: the reference's workflow-1 end to end (features →
    // k-means blocking → candidate join → cosine kernel → global top-K),
    // ExtractCandidates + BillAnalyzer + Postprocessor in one declarative plan
    "q_billmatch" -> QueryDef.rowsOnly { (s, d) =>
      val (_, clustered) = Clustering.kmeans(featurized(s, d), k = 8, maxIter = 20)
      val pairs = Candidates.pairs(clustered, CandidateConfig(
        keyCol = "doc_id", groupCol = "lang", blockCol = Some("prediction")))
      val withVecs = Candidates.attachBothSides(pairs,
        clustered.select(col("doc_id"), col("features")), "doc_id", "features")
      val cosine = Kernels.udfFor("cosine")
      withVecs
        .select(col("pk1"), col("pk2"),
          cosine(col("features_1"), col("features_2")).as("similarity"))
        .orderBy(desc("similarity"), asc("pk1"), asc("pk2"))
        .limit(50)
    }
  )
}
