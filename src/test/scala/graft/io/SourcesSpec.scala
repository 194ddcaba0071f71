package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Source/sink round-trips beyond the parquet gate surface (SURVEY §2.1):
  * CSV and ORC with declared schemas, JSON-lines (S1), and the built-in rate
  * streaming source. Declared StructType on read keeps schema authority with
  * the engine (S2), matching the JSON-schema-projection idiom the reference
  * used (docs/3state_test.md:34-35).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sample = Tables.orders(spark, sfDir)
    .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    .filter($"o_orderkey" % 100 === 0)

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_src_$tag").toString

  test("CSV round-trip with declared schema (header, no inference)") {
    val dir = tmp("csv")
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.schema == schema)
    val a = sample.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
  }

  test("ORC round-trip preserves schema and values exactly") {
    val dir = tmp("orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      sample.orderBy("o_orderkey").collect().toSeq)
  }

  test("JSON-lines round-trip with declared schema keeps long/double types") {
    val dir = tmp("json")
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.schema == sample.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      sample.orderBy("o_orderkey").collect().toSeq)
  }

  test("rate source streams monotonically increasing rows with (ts, value)") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500")
      .load()
      .writeStream.format("memory").queryName("rate_smoke")
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      var n = 0L
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (n < 10 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        n = spark.table("rate_smoke").count()
      }
      assert(n >= 10, s"rate source produced only $n rows")
      val vals = spark.table("rate_smoke").select("value").as[Long].collect()
      assert(vals.distinct.length == vals.length, "values must be unique")
      assert(spark.table("rate_smoke").schema.fieldNames.toSeq ==
        Seq("timestamp", "value"))
    } finally q.stop()
  }
}
