package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 BillsGen source: pushdown and partition-planning contracts, asserted
  * from the EXECUTED physical plan (not just the query result).
  */
class BillsGenSourceSpec extends SparkSpec {

  private def read(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft.sources.BillsGen")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  private def scanOf(df: DataFrame): BatchScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // AQE wraps any plan with exchanges; descend into the adaptive subtree
    def find(p: SparkPlan): Option[BatchScanExec] =
      p.collectFirst { case b: BatchScanExec => b }.orElse(
        p.collectFirst { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => find(a.executedPlan)))
    find(df.queryExecution.executedPlan).getOrElse(fail("no BatchScanExec in plan"))
  }

  test("reads the declared schema and row count, deterministically") {
    val df = read("rows" -> "500")
    assert(df.schema.fieldNames.toSeq ==
      Seq("primary_key", "state", "year", "docid", "docversion", "length", "content"))
    assert(df.count() == 500)
    // retry-stability: two full reads produce identical rows
    val a = df.orderBy("primary_key", "docid").collect()
    val b = read("rows" -> "500").orderBy("primary_key", "docid").collect()
    assert(a.sameElements(b))
  }

  test("state/year filters are pushed into the scan and fully consumed") {
    val df = read("rows" -> "2000").filter(col("state") === 7 && col("year") >= 2010)
    val scan = scanOf(df)
    val desc = scan.scan.description()
    assert(desc.contains("EqualTo(state,7)"), desc)
    assert(desc.contains("GreaterThanOrEqual(year,2010)"), desc)
    // accepted filters leave no residual Filter node above the scan
    assert(!df.queryExecution.executedPlan.toString.contains("Filter ("))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("state") == 7L && r.getAs[Long]("year") >= 2010L))
    // and the filtered set equals the post-hoc filter of the unfiltered read
    val expect = read("rows" -> "2000").collect()
      .count(r => r.getAs[Long]("state") == 7L && r.getAs[Long]("year") >= 2010L)
    assert(rows.length == expect)
  }

  test("content predicates are NOT pushed — Spark evaluates them post-scan") {
    val df = read("rows" -> "300").filter(col("content").contains("tax"))
    val desc = scanOf(df).scan.description()
    assert(!desc.toLowerCase.contains("contains"), desc)
    val expect = read("rows" -> "300").collect()
      .count(_.getAs[String]("content").contains("tax"))
    assert(df.count() == expect && expect > 0)
  }

  test("column pruning reaches the generator (ReadSchema shrinks)") {
    val df = read("rows" -> "300").select("state", "year")
    val desc = scanOf(df).scan.description()
    assert(desc.contains("ReadSchema=state,year"), desc)
    assert(df.columns.toSeq == Seq("state", "year"))
  }

  test("COUNT/MIN/MAX push into the scan as partial aggregates") {
    val df = read("rows" -> "5000").agg(
      count(lit("*")).as("n"), min("state").as("mn"), max("year").as("mx"))
    val desc = scanOf(df).scan.description()
    assert(desc.contains("PushedAggregates=[COUNT(*), MIN(state), MAX(year)]"), desc)
    // the scan now emits partial-agg rows, not table rows
    assert(desc.contains("ReadSchema=agg_0,agg_1,agg_2"), desc)
    val r = df.collect().head
    assert(r.getAs[Long]("n") == 5000L)
    val full = read("rows" -> "5000").agg(min("state"), max("year")).collect().head
    assert(r.getAs[Long]("mn") == full.getLong(0) && r.getAs[Long]("mx") == full.getLong(1))
  }

  test("aggregate pushdown composes with filter pushdown") {
    val df = read("rows" -> "5000").filter(col("year") < 2005)
      .agg(count(lit("*")).as("n"), max("state").as("mx"))
    val desc = scanOf(df).scan.description()
    assert(desc.contains("LessThan(year,2005)") && desc.contains("PushedAggregates"), desc)
    val expect = read("rows" -> "5000").collect()
      .filter(_.getAs[Long]("year") < 2005)
    assert(df.collect().head.getAs[Long]("n") == expect.length.toLong)
    assert(df.collect().head.getAs[Long]("mx") == expect.map(_.getAs[Long]("state")).max)
  }

  test("grouped or non-cheap aggregates decline pushdown and stay correct") {
    val df = read("rows" -> "1000").groupBy("docversion").agg(count(lit("*")).as("n"))
    assert(!scanOf(df).scan.description().contains("PushedAggregates"))
    assert(df.collect().map(_.getAs[Long]("n")).sum == 1000L)
  }

  test("row range splits into numPartitions independent partitions") {
    val df = read("rows" -> "1000", "numPartitions" -> "5")
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 1000)
    // a different partitioning yields the same table
    val other = read("rows" -> "1000", "numPartitions" -> "3")
    assert(other.exceptAll(df).count() == 0 && df.exceptAll(other).count() == 0)
  }

  private def readStream(opts: (String, String)*): DataFrame = {
    val r = spark.readStream.format("graft.sources.BillsGen")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("micro-batch stream drains the full row range under AvailableNow " +
      "in admission-sized batches and matches the batch read") {
    val streamed = graft.streaming.Streaming.replayToTable(
      readStream("rows" -> "2000", "rowsPerBatch" -> "500")
        .groupBy("state").agg(count(lit(1)).as("n")),
      s"bills_stream_${System.nanoTime()}")
    val batch = read("rows" -> "2000").groupBy("state").agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("streaming scan applies the same filter pushdown semantics") {
    // rows with state >= 10 are filtered; streamed result == batch result
    val streamed = graft.streaming.Streaming.replayToTable(
      readStream("rows" -> "1000", "rowsPerBatch" -> "400")
        .filter(col("state") < 10)
        .groupBy("state").agg(count(lit(1)).as("n")),
      s"bills_stream_f_${System.nanoTime()}")
    val batch = read("rows" -> "1000").filter(col("state") < 10)
      .groupBy("state").agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
    assert(streamed.select(sum("n")).head.getLong(0) ==
      read("rows" -> "1000").filter(col("state") < 10).count())
  }
}
