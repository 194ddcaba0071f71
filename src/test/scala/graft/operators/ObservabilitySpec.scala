package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pipeline observability surfaces a 100 TB job depends on:
  *
  *  1. `Dataset.observe` — data-quality counters (row counts, null counts,
  *     sums) collected DURING the main action, no second scan over the
  *     input. The one honest way to emit "rows read / rows dropped" metrics
  *     from a petabyte pass.
  *  2. the `statestore` batch reader — Spark 4's debugger for Structured
  *     Streaming state: the checkpoint of a stateful query read back as a
  *     plain DataFrame, so an on-call engineer can inspect (or audit) the
  *     live aggregation state of a long-running stream without stopping it.
  */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("observe: metrics collected in the same pass equal a direct agg") {
    val df = Seq(("a", 1L), ("b", 2L), (null, 3L), ("d", 4L))
      .toDF("k", "v")
    val obs = Observation("quality")
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(col("k")).as("n_nonnull_k"),
      sum("v").as("sum_v"))
    val kept = observed.filter(col("k").isNotNull).count()
    val m = obs.get
    assert(kept === 3)
    assert(m("n_rows") === 4L)     // observe sees pre-filter rows
    assert(m("n_nonnull_k") === 3L)
    assert(m("sum_v") === 10L)
  }

  test("statestore reader: checkpointed aggregation state is queryable") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_state_").toString
    val in = MemoryStream[(String, Long)]
    in.addData(("u1", 5L), ("u2", 7L), ("u1", 9L))
    val agg = in.toDF().toDF("user", "v")
      .groupBy("user").agg(count(lit(1)).as("n"), sum("v").as("total"))
    val q = agg.writeStream.format("memory").queryName("obs_state")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()

    val state = spark.read.format("statestore").load(ckpt)
    // key struct carries the grouping key; value struct the agg buffer,
    // fields named for the AGGREGATE FUNCTIONS (count/sum), not the aliases
    val rows = state.select(col("key.user"), col("value.count"),
        col("value.sum"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(rows === Seq(("u1", 2L, 14L), ("u2", 1L, 7L)))
  }
}
