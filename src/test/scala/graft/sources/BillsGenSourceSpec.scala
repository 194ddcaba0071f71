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

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

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

  test("row range splits into numPartitions independent partitions") {
    val df = read("rows" -> "1000", "numPartitions" -> "5")
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 1000)
    // a different partitioning yields the same table
    val other = read("rows" -> "1000", "numPartitions" -> "3")
    assert(other.exceptAll(df).count() == 0 && df.exceptAll(other).count() == 0)
  }
}
