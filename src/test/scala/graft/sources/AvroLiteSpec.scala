package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** AvroLite DSv2 source + writer: typed round-trip (incl. nulls and binary),
  * per-file partition planning, and column pruning reaching the reader. */
class AvroLiteSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("avrolite").toString

  private def scanOf(df: DataFrame): BatchScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def find(p: SparkPlan): Option[BatchScanExec] =
      p.collectFirst { case b: BatchScanExec => b }.orElse(
        p.collectFirst { case a: AdaptiveSparkPlanExec => a }
          .flatMap(a => find(a.executedPlan)))
    find(df.queryExecution.executedPlan).getOrElse(fail("no BatchScanExec in plan"))
  }

  test("typed round-trip: all supported types, nulls preserved") {
    val dir = tmpDir()
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(2.5f), Some(7), Some(true)),
      (2L, None, None, None, None, None),
      (3L, Some("gamma"), Some(-0.25), Some(0f), Some(-1), Some(false))
    ).toDF("id", "s", "d", "f", "i", "b")
      .withColumn("bin",
        when(col("id") =!= 2L, col("s").cast("binary")))
    AvroLite.write(df, dir)
    val back = spark.read.format("graft.sources.AvroLite").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    val bk = back.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    assert(bk.toSeq == a.toSeq)
  }

  test("one InputPartition per container file") {
    val dir = tmpDir()
    val df = (1L to 100L).toDF("id").repartition(4)
    AvroLite.write(df, dir)
    assert(AvroLite.listFiles(dir).size == 4)
    val back = spark.read.format("graft.sources.AvroLite").load(dir)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.as[Long].collect().sorted.toSeq == (1L to 100L))
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val dir = tmpDir()
    AvroLite.write(Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("id", "s", "n"), dir)
    val back = spark.read.format("graft.sources.AvroLite").load(dir)
      .select("n")
    val desc = scanOf(back).scan.description()
    assert(desc.contains("ReadSchema=n"), desc)
    assert(back.as[Long].collect().sorted.toSeq == Seq(10L, 20L))
  }

  test("DSv2 write: append accumulates, overwrite truncates, _SUCCESS lands") {
    val dir = tmpDir()
    (1L to 10L).toDF("id").repartition(2)
      .write.format("graft.sources.AvroLite").mode("append").save(dir)
    (11L to 20L).toDF("id").repartition(2)
      .write.format("graft.sources.AvroLite").mode("append").save(dir)
    def ids() = spark.read.format("graft.sources.AvroLite").load(dir)
      .as[Long].collect().sorted.toSeq
    assert(ids() == (1L to 20L))
    assert(new java.io.File(dir, "_SUCCESS").exists())
    // no uncommitted attempt files left behind
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".tmp")))
    (21L to 25L).toDF("id").repartition(1)
      .write.format("graft.sources.AvroLite").mode("overwrite").save(dir)
    assert(ids() == (21L to 25L))
  }

  test("micro-batch stream: drain equals batch; admission bounds files per trigger") {
    val dir = tmpDir()
    (1L to 6L).toDF("id").repartition(3)
      .write.format("graft.sources.AvroLite").mode("append").save(dir)
    (7L to 9L).toDF("id").repartition(2)
      .write.format("graft.sources.AvroLite").mode("append").save(dir)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft.sources.AvroLite")
      .option("maxFilesPerTrigger", "2")
      .load(dir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) batches.incrementAndGet()
        b.collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }
      .start()
    q.awaitTermination(60000)
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.sorted == (1L to 9L), s"saw $seen")
    // 5 files at 2 per trigger → at least 3 non-empty micro-batches
    assert(batches.get() >= 3, s"admission ignored: ${batches.get()} batches")
  }

  test("schema mapping round-trips nullability and rejects nested types") {
    val st = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = true)))
    assert(AvroLite.toStructType(AvroLite.toAvroSchema(st)) == st)
    intercept[IllegalArgumentException] {
      AvroLite.toAvroSchema(StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
  }
}
