package graft.lsh

import graft.similarity.Kernels
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-similarity self-joins on stock Spark ML LSH estimators
  * (SURVEY M11/M12/J3).
  *
  * The reference forked Spark's MinHashLSH to change keyDistance to the
  * asymmetric-Jaccard form min(1−|∩|/|x|, 1−|∩|/|y|)
  * (reference CustomizedMinHashLSH.scala:46-58) and then drove 1225 per-state-
  * pair driver jobs (ExtractMinHashLSH.scala:114-115). Here:
  *  - the stock estimator generates candidates (bucket recall does not depend
  *    on which distance is reported);
  *  - the asymmetric distance is recomputed post-join as a column — no engine
  *    fork, same results;
  *  - ONE join over the whole corpus replaces the driver-side state-pair loop;
  *    cross-group constraints are plain join predicates.
  */
object LshJoins {

  /** Nonzero-entry count — MinHashLSH requires >= 1 per vector. */
  private val nnz = udf((v: Vector) => v.numNonzeros)

  /** MinHash LSH self-join. Input must carry a binary-ish sparse Vector column
    * (nonzero entries = set members). Returns (pk1, pk2, jaccard_dist,
    * asym_jaccard_dist) with pk1 < pk2, jaccard_dist < threshold.
    * Config parity with the reference: numTables=100, seed=12345
    * (ExtractMinHashLSH.scala:108-111) — defaults lowered for test scale. */
  def minHashSelfJoin(df: DataFrame, idCol: String, featuresCol: String,
                      threshold: Double, numTables: Int = 16,
                      seed: Long = 12345L): DataFrame = {
    // docs whose text reduces to nothing (all stopwords/digits) are empty
    // SETS — no near-dup semantics — and would otherwise kill the whole job
    val nonEmpty = df.filter(nnz(col(featuresCol)) > 0)
    val model = new MinHashLSH()
      .setInputCol(featuresCol).setOutputCol("__hashes")
      .setNumHashTables(numTables).setSeed(seed)
      .fit(nonEmpty)
    val joined = model.approxSimilarityJoin(nonEmpty, nonEmpty, threshold, "jaccard_dist")
    val asym = udf { (x: Vector, y: Vector) =>
      1.0 - math.max(Kernels.leftJaccard(x, y), Kernels.rightJaccard(x, y)) / 100.0
    }
    joined
      .filter(col(s"datasetA.$idCol") < col(s"datasetB.$idCol"))
      .select(
        col(s"datasetA.$idCol").as("pk1"),
        col(s"datasetB.$idCol").as("pk2"),
        col("jaccard_dist"),
        asym(col(s"datasetA.$featuresCol"), col(s"datasetB.$featuresCol"))
          .as("asym_jaccard_dist"))
  }

  /** Bucketed random-projection (Euclidean) LSH self-join (reference
    * BucketedRandomProjectionLSHExample.scala:106-112: bucketLength 2.0,
    * 3 tables). Returns (pk1, pk2, dist) with pk1 < pk2, dist < threshold. */
  def brpSelfJoin(df: DataFrame, idCol: String, featuresCol: String,
                  threshold: Double, bucketLength: Double = 2.0,
                  numTables: Int = 3, seed: Long = 12345L): DataFrame = {
    val model = new BucketedRandomProjectionLSH()
      .setInputCol(featuresCol).setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      .fit(df)
    model.approxSimilarityJoin(df, df, threshold, "dist")
      .filter(col(s"datasetA.$idCol") < col(s"datasetB.$idCol"))
      .select(
        col(s"datasetA.$idCol").as("pk1"),
        col(s"datasetB.$idCol").as("pk2"),
        col("dist"))
  }

  /** Approx k-NN for one probe vector (reference CustomizedLSH.scala:92-137
    * single-probe path): model hash + bucket filter + true-distance sort. */
  def minHashKnn(df: DataFrame, idCol: String, featuresCol: String,
                 probe: Vector, k: Int, numTables: Int = 16,
                 seed: Long = 12345L): DataFrame = {
    val nonEmpty = df.filter(nnz(col(featuresCol)) > 0)
    // an empty-set probe has no neighbors under Jaccard — and would trip
    // MinHashLSH's nonzero requirement
    if (probe.numNonzeros == 0)
      return df.filter(lit(false))
        .select(col(idCol), lit(null).cast("double").as("jaccard_dist"))
    val model = new MinHashLSH()
      .setInputCol(featuresCol).setOutputCol("__hashes")
      .setNumHashTables(numTables).setSeed(seed)
      .fit(nonEmpty)
    model.approxNearestNeighbors(nonEmpty, probe, k, "jaccard_dist")
      .select(col(idCol), col("jaccard_dist"))
  }
}
