package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-clustered write layout: every output file owns a disjoint key range
  * (so parquet min/max stats prune), and a point-range read actually skips
  * row groups, measured from the scan's output rows vs a random layout.
  */
class LayoutSpec extends SparkSpec {

  test("writeRangeClustered produces files with disjoint key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    val ev = Tables.events(spark, sfDir)
    Tables.writeRangeClustered(ev, s"$dir/clustered", Seq("event_id"), 8)

    val ranges = spark.read.parquet(s"$dir/clustered")
      .select(col("event_id"), input_file_name().as("f"))
      .groupBy("f")
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .orderBy("lo")
      .collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))

    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: hi=$hi1 vs next lo=$lo2")
      case _ =>
    }
    // round-trips the full table
    assert(spark.read.parquet(s"$dir/clustered").count() == ev.count())
  }

  test("range filter on the clustered layout reads fewer rows than shuffled layout") {
    val dir = java.nio.file.Files.createTempDirectory("layout2").toString
    val ev = Tables.events(spark, sfDir)
    Tables.writeRangeClustered(ev, s"$dir/clustered", Seq("event_id"), 8)
    // adversarial baseline: same data, random order (max-entropy stats)
    ev.orderBy(md5(col("event_id").cast("string").cast("binary")))
      .coalesce(8).write.parquet(s"$dir/shuffled")

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("event_id") < 100)
      df.collect()
      // rows OUTPUT by the scan node (post row-group pruning, pre nothing —
      // the filter is applied after parquet hands rows back, so the scan
      // metric counts what the row groups actually surfaced)
      val scans = df.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    }
    val clustered = scannedRows(s"$dir/clustered")
    val shuffled = scannedRows(s"$dir/shuffled")
    assert(clustered < shuffled,
      s"clustered layout scanned $clustered rows, shuffled $shuffled — no pruning win")
  }
}
