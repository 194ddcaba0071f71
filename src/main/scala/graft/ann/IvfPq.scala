package graft.ann

import graft.similarity.ArrayOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed ANN index — IVF coarse routing picks the nProbe
  * nearest k-means partitions per query, PQ asymmetric-distance tables score
  * ONLY those partitions' candidates. The standard large-scale layout
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search", 2011):
  * routing bounds the scan, codes bound the memory.
  *
  * 100 TB shape: both index halves travel light — centroids broadcast
  * (k·dim doubles), routed (query, ADC-table) pairs broadcast, and the
  * corpus-side state is one int per vector (centroid_id) plus m code bytes;
  * the full-precision embedding column is never read at search time. The
  * join on centroid_id is a broadcast-hash join against the code table —
  * one scan, no shuffle of corpus rows.
  */
object IvfPq {

  /** Route probes through `ivf`'s centroids, score candidates with `pq`'s
    * codes. The two indexes must be built over the SAME corpus and id column
    * (Ivf keeps the id in `assigned`; Pq keys `codes` by `__id`).
    *
    * @return (qIdCol, cand_id, approx_d2, rn), rn 1..topK per probe,
    *         deterministic tie-break on cand_id
    */
  def search(ivf: Ivf.Index, pq: Pq.Index, probes: DataFrame, idCol: String,
             qIdCol: String = "q_id", qVecCol: String = "qv",
             topK: Int = 10, nProbe: Int = 4): DataFrame = {
    // exact squared L2 to each coarse centroid; deterministic tie-break
    val d2 = ArrayOps.norm2sq(col(qVecCol)) + ArrayOps.norm2sq(col("cvec")) -
      lit(2.0) * ArrayOps.dot(col(qVecCol), col("cvec"))
    val wc = Window.partitionBy(qIdCol).orderBy(asc("__cd"), asc("centroid_id"))
    val routed = probes.crossJoin(broadcast(ivf.centroids))
      .withColumn("__cd", d2)
      .withColumn("__crn", row_number().over(wc))
      .filter(col("__crn") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("centroid_id"))
    // ADC table per (probe, probed-centroid) row; the full query vector is
    // dropped right after — only tables travel
    val tabled = routed
      .select(col(qIdCol), col("centroid_id"),
        Pq.adcTableUdf(pq)(col(qVecCol)).as("__tab"))
    // corpus-side state: id → (centroid_id, codes); embeddings never read
    val cands = ivf.assigned.select(col(idCol).as("__id"), col("centroid_id"))
      .join(pq.codes, "__id")
    // bounded per-probe top-K partial aggregation, not a window — the
    // window form shuffles every scored candidate (nProbe/k of the corpus
    // per probe); this shuffles one ≤topK buffer per partition per probe.
    // Distances rank ASCENDING, the aggregator keeps LARGEST scores, so it
    // aggregates on the negated distance — the double sign-flip restores
    // approx_d2 bit-exactly (IEEE negation is exact), ties break on the
    // smaller cand_id exactly like the previous `asc("cand_id")`.
    broadcast(tabled).join(cands, Seq("centroid_id"))
      .filter(col("__id") =!= col(qIdCol))
      .select(col(qIdCol), col("__id").as("__cid"),
        Pq.adcScoreCol(pq, col("__tab"), col("codes")).as("__d2"))
      .groupBy(qIdCol)
      .agg(graft.functions.Aggregators.topKScored(topK)(
        -col("__d2"), col("__cid")).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(qIdCol), col("__t._2").as("cand_id"),
        (-col("__t._1")).as("approx_d2"),
        (col("__pos") + 1).cast("int").as("rn"))
  }
}
