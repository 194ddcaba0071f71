package graft.linalg

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.mllib.linalg.distributed.{CoordinateMatrix, MatrixEntry, RowMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
  * similarity operator, complementary to LSH blocking. Requires doc count to
  * fit a matrix column index (Int) — use LSH beyond ~2e9 docs.
  */
object Dimsum {

  /** (d1, d2, cos_sim) for all column pairs with estimated cosine similarity
    * >= threshold. `idCol` must hold integral ids; they become matrix column
    * indices directly. */
  def docSimilarities(df: DataFrame, idCol: String, featuresCol: String,
                      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val entries = df.select(col(idCol).cast("long"), col(featuresCol)).rdd
      .flatMap { row =>
        val id = row.getLong(0)
        val v = row.getAs[Vector](1)
        val buf = scala.collection.mutable.ArrayBuffer.empty[MatrixEntry]
        v.foreachActive((featIdx, value) =>
          if (value != 0.0) buf += MatrixEntry(featIdx.toLong, id, value))
        buf
      }
    val transposed: RowMatrix = new CoordinateMatrix(entries).toRowMatrix()
    transposed.columnSimilarities(threshold).entries
      .map(e => (e.i, e.j, e.value))
      .toDF("d1", "d2", "cos_sim")
  }
}
