package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning (SURVEY §2.12 at
  * 100 TB: the scan must touch only the partition directories the filter
  * selects — data the filter excludes is never opened, not merely skipped
  * row-group by row-group).
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  /** File scans of an executed frame, reaching through AQE wrapping. */
  private def fileScans(q: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = q.queryExecution.executedPlan
    val plans = root +: root.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
    plans.flatMap(_.collect { case f: FileSourceScanExec => f })
  }

  test("a partition filter prunes the scan to matching directories only") {
    val dir = Files.createTempDirectory("graft_part").toString
    try {
      Tables.events(spark, sfDir)
        .write.partitionBy("event_type").mode("overwrite").parquet(dir)

      val q = spark.read.parquet(dir)
        .filter(col("event_type") === "purchase")
        .agg(count(lit(1)).as("n"))
      val n = q.as[Long].head()
      val expected = Tables.events(spark, sfDir)
        .filter(col("event_type") === "purchase").count()
      assert(n == expected && n > 0)

      // plan evidence: the predicate became a PartitionFilter, and the scan's
      // file listing collapsed to the one matching directory
      val scan = fileScans(q).head
      val planStr = scan.toString
      assert(planStr.contains("PartitionFilters"), planStr)
      assert(planStr.contains("event_type"), planStr)
      val scanned = scan.selectedPartitions.totalNumberOfFiles
      val allFiles = fileScans(spark.read.parquet(dir))
        .head.selectedPartitions.totalNumberOfFiles
      assert(scanned < allFiles,
        s"pruned scan reads $scanned of $allFiles files — nothing was pruned")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    try {
      // fact partitioned by user_mod; a FILTERED file-backed dim selects 2 of
      // 10 partitions (DPP's trigger pattern: partition key = join key, dim
      // carries a selective filter)
      Tables.events(spark, sfDir)
        .withColumn("user_mod", col("user_id") % 10)
        .write.partitionBy("user_mod").mode("overwrite").parquet(dir)
      (0L to 9L).map(m => (m, if (m == 0 || m == 7) "keep" else "drop"))
        .toDF("user_mod", "tag")
        .write.mode("overwrite").parquet(s"$dir-dim")
      val dim = spark.read.parquet(s"$dir-dim").filter(col("tag") === "keep")

      val fact = spark.read.parquet(dir)
      val q = fact.join(dim, Seq("user_mod")).agg(count(lit(1)).as("n"))
      val n = q.as[Long].head()
      val expected = Tables.events(spark, sfDir)
        .filter(col("user_id") % 10 === 0 || col("user_id") % 10 === 7).count()
      assert(n == expected && n > 0)
      // after execution, the fact scan must have been narrowed at runtime
      val factScan = fileScans(q)
        .find(_.output.exists(_.name == "user_mod"))
      assert(factScan.nonEmpty, "fact file scan not found in executed plan")
      // the DPP filter applies at runtime (dynamicallySelectedPartitions), so
      // the evidence is the scan's partitions-read metric, not the static
      // listing — plus the dynamicpruningexpression in the plan itself
      assert(factScan.get.toString.contains("dynamicpruning"),
        s"no DPP filter on the fact scan:\n${factScan.get}")
      val scanned = factScan.get.metrics("numPartitions").value
      assert(scanned <= 2, s"DPP read $scanned partitions, expected <= 2")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dir-dim"))
    }
  }
}
