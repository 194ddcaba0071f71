package graft.io

import graft.SparkSpec
import graft.streaming.Streaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Fixture contract: both event readers absorb whatever physical ts encoding
  * the driver-generated parquet ships (TIMESTAMP(NANOS)-as-Long,
  * TIMESTAMP_NTZ, plain TIMESTAMP) and surface identical session-UTC
  * TimestampType instants in a sane epoch range.
  *
  * Parity alone is NOT enough: batch and stream share
  * [[Tables.normalizeEventTs]], so a normalizer bug would pass a
  * batch==stream check trivially. The absolute-range assertions are the
  * independent anchor — the round-4 regression (micros divided by 1000)
  * collapsed every event into ~2 hours of 1970 and would fail them
  * immediately, on either path.
  */
class FixtureContractSpec extends SparkSpec {
  import spark.implicits._

  private val lo = java.sql.Timestamp.valueOf("2015-01-01 00:00:00").getTime
  private val hi = java.sql.Timestamp.valueOf("2040-01-01 00:00:00").getTime

  test("batch events reader: ts is TimestampType in a plausible epoch range") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val (mn, mx) = ev.agg(min(col("ts")).cast("long") * 1000L,
        max(col("ts")).cast("long") * 1000L)
      .as[(Long, Long)].head()
    assert(mn >= lo && mx <= hi,
      s"batch ts range [$mn, $mx] ms outside plausible [$lo, $hi]")
  }

  test("any declared-timestamp column shipped as nanos-Long is normalized at load") {
    // simulate a fixture regeneration flipping o_orderdate to TIMESTAMP(NANOS)
    // (the encoding events.ts had in rounds 1-3, surfacing as LongType)
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_").toString
    val usInstant = java.sql.Timestamp.valueOf("2024-06-01 12:00:00").getTime * 1000L
    spark.range(3).selectExpr(
        "id AS o_orderkey", "id AS o_custkey", "'O' AS o_orderstatus",
        "1.0 AS o_totalprice",
        s"(${usInstant}L + id * 1000000L) * 1000L AS o_orderdate", // nanos
        "'1-URGENT' AS o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Tables.orders(spark, dir)
    assert(got.schema("o_orderdate").dataType == TimestampType)
    val mn = got.agg(min(unix_micros(col("o_orderdate")))).as[Long].head()
    assert(mn == usInstant, s"nanos not re-derived: $mn vs $usInstant")
  }

  test("TPC-H timestamp columns land in a plausible epoch range at load") {
    // the same drift class events.ts hit: if the generator flips
    // o_orderdate / l_shipdate encodings, the normalized values must still
    // be sane instants (nanos-as-Long misread as micros would be 1970)
    // TPC-H business dates live in the spec's 1992-1998 window, not the
    // events table's wall-clock range
    val tlo = java.sql.Timestamp.valueOf("1990-01-01 00:00:00").getTime
    val thi = java.sql.Timestamp.valueOf("2010-01-01 00:00:00").getTime
    for ((table, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val df = Tables.load(spark, sfDir, table)
      val (mn, mx) = df.agg(min(col(c)).cast("timestamp").cast("long") * 1000L,
          max(col(c)).cast("timestamp").cast("long") * 1000L)
        .as[(Long, Long)].head()
      assert(mn >= tlo && mx <= thi,
        s"$table.$c range [$mn, $mx] ms outside plausible [$tlo, $thi]")
    }
  }

  test("streaming events reader: same schema, same rows, same instants as batch") {
    val batch = Tables.events(spark, sfDir)
    val streamed = Streaming.replayToTable(
      Streaming.eventStream(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n")),
      "t_fixture_contract")
      .select(unix_timestamp(col("window.start")).as("ws"), col("n"))
      .as[(Long, Long)].collect().toMap
    val b = batch
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("n"))
      .as[(Long, Long)].collect().toMap
    assert(streamed == b)
    assert(b.nonEmpty)
    // absolute anchor on the STREAM path too: window starts in epoch range
    assert(streamed.keys.forall(ws => ws * 1000L >= lo && ws * 1000L <= hi),
      s"stream window starts outside plausible range: ${streamed.keys.take(3)}")
  }
}
