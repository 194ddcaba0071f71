package graft.io

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability via observe(): named metrics ride the query
  * itself (collected by the driver from task-side accumulators), so a 100 TB
  * job reports row counts / quality tallies with ZERO extra passes over the
  * data — the production alternative to re-running count() per stage.
  */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("observe() metrics arrive with the action, no second scan") {
    val obs = Observation("ingest_stats")
    val li = Tables.lineitem(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") > 30, 1).otherwise(0)).as("big_qty_rows"))
    // one action drives both the aggregate and the observation
    val distinctFlags = li.select("l_returnflag").distinct().count()
    assert(distinctFlags > 0)
    val m = obs.get
    assert(m("rows_seen") == li.count())
    val expectedBig = li.filter(col("l_quantity") > 30).count()
    assert(m("big_qty_rows") == expectedBig)
  }
}
