package graft.linalg

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.mllib.linalg.distributed.{CoordinateMatrix, MatrixEntry, RowMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, max, min}

/** DIMSUM sampled all-pairs cosine similarity (SURVEY M13/J10).
  *
  * The reference transposes the doc×feature matrix by hand
  * (reference linalg/LinalgUtils.scala:56-77) and calls
  * RowMatrix.columnSimilarities(threshold) (feature/Utils.scala:123-127,
  * DIMSUM.scala:102-106) so documents become columns. Same shape here, but the
  * transpose goes through a CoordinateMatrix (no hand-rolled index juggling)
  * and ids are carried as the column index, so no re-join is needed.
  *
  * Scale note: DIMSUM's sampling bounds shuffle size by the similarity
  * threshold — it is the approximate physical strategy of the all-pairs
  * similarity operator, complementary to LSH blocking. Requires doc COUNT to
  * fit a matrix column index (Int) — use LSH beyond ~2e9 docs. The column
  * index space is the doc count, never the doc-id RANGE: RowMatrix's
  * magnitude accumulators are DENSE numCols-sized double arrays built in
  * every task, so keying columns by raw id would make memory O(max id) —
  * the r13 sf1-equivalent registry run, whose fixture strides ids by 10M
  * per replica, had every task attempt a 720 MB allocation (90M-element
  * array = max id 90 000 004) and OOM the JVM before ids were rank-mapped.
  */
object Dimsum {

  /** (d1, d2, cos_sim) for all column pairs with estimated cosine similarity
    * >= threshold. `idCol` must hold unique integral ids. Ids that already
    * form a dense [0, n) space index the matrix directly (no extra jobs —
    * and the sf0.01 gate pin predates the remap, so the dense path must
    * stay byte-identical); any other id space is rank-compressed first
    * (sort + zipWithIndex — deterministic) and mapped back on output, so
    * task memory scales with the corpus, not the id range. */
  def docSimilarities(df: DataFrame, idCol: String, featuresCol: String,
                      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("__id"),
      col(featuresCol).as("__f"))
    val stats = base.agg(count(lit(1)), min("__id"), max("__id")).head
    val n = stats.getLong(0)
    if (n == 0)
      return Seq.empty[(Long, Long, Double)].toDF("d1", "d2", "cos_sim")
    val dense = stats.getLong(1) == 0L && stats.getLong(2) == n - 1
    val rankDf =
      if (dense) null
      else base.select("__id").rdd.map(_.getLong(0))
        .sortBy(identity).zipWithIndex().toDF("__id", "__col")
    val keyed =
      if (dense) base.select(col("__id").as("__col"), col("__f"))
      else base.join(rankDf, "__id").select(col("__col"), col("__f"))
    val entries = keyed.rdd
      .flatMap { row =>
        val id = row.getLong(0)
        val v = row.getAs[Vector](1)
        val buf = scala.collection.mutable.ArrayBuffer.empty[MatrixEntry]
        v.foreachActive((featIdx, value) =>
          if (value != 0.0) buf += MatrixEntry(featIdx.toLong, id, value))
        buf
      }
    val transposed: RowMatrix = new CoordinateMatrix(entries).toRowMatrix()
    // r14: pin-compatible fork of mllib's columnSimilarities — identical
    // sampling/arithmetic (DimsumForkSpec proves bit-for-bit parity), minus
    // the per-product boxing that profiled at 37% GC / 3.2 GB spill. See
    // org.apache.spark.mllib.graft.DimsumFork.
    val sims = org.apache.spark.mllib.graft.DimsumFork
      .similarColumns(transposed, threshold)
      .toDF("__c1", "__c2", "cos_sim")
    if (dense)
      sims.select(col("__c1").as("d1"), col("__c2").as("d2"), col("cos_sim"))
    else
      // two equi-joins on the POST-THRESHOLD pair set (≪ corpus after
      // sampling); the rank frame recomputes deterministically per use
      sims
        .join(rankDf.select(col("__col").as("__c1"), col("__id").as("d1")), "__c1")
        .join(rankDf.select(col("__col").as("__c2"), col("__id").as("d2")), "__c2")
        .select("d1", "d2", "cos_sim")
  }
}
