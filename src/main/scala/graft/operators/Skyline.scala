package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows where no other row is <= on `minCol`
  * AND >= on `maxCol` with at least one strict inequality.
  *
  * Scale rewrite of the O(n²) dominance definition: a per-`minCol` max of
  * `maxCol` (map-side combinable aggregation), a running-max sweep over the
  * DISTINCT `minCol` values only (a row survives iff its best `maxCol` beats
  * every strictly-cheaper group's best), and one equi-join to re-attach the
  * surviving rows. Ties on both dimensions all survive — no strict
  * inequality exists between them — which the equi-join on (minCol, maxCol)
  * preserves. `SkylinePropertySpec` pins the sweep to the brute-force
  * definition on random inputs; the q_skyline gate hashes it against a
  * NOT EXISTS oracle in DuckDB.
  */
object Skyline {

  def pareto2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val best = df.groupBy(col(minCol).as("__sk_price"))
      .agg(max(col(maxCol)).as("__sk_best"))
    val w = Window.orderBy("__sk_price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best.withColumn("__sk_prior", max("__sk_best").over(w))
      .filter(col("__sk_prior").isNull || col("__sk_best") > col("__sk_prior"))
    df.join(broadcast(frontier),
        col(minCol) === col("__sk_price") && col(maxCol) === col("__sk_best"))
      .drop("__sk_price", "__sk_best", "__sk_prior")
  }
}
