package graft.operators

import graft.SparkSpec

/** As-of join semantics: latest right.ts <= left.ts per key, ties inclusive. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // right: price updates per symbol
  private lazy val updates = Seq(
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "ts", "price")

  // left: trades
  private lazy val trades = Seq(
    ("t1", "A", 5L),   // before any update → null
    ("t2", "A", 20L),  // exactly at update → 2.0 (inclusive)
    ("t3", "A", 25L),  // between → 2.0
    ("t4", "A", 99L),  // after all → 3.0
    ("t5", "B", 14L),  // before B's only update → null
    ("t6", "B", 16L),  // after → 9.0
    ("t7", "C", 50L)   // key with no right rows → null
  ).toDF("trade", "sym", "ts")

  test("latest prior right row attaches; ties inclusive; misses are null") {
    val got = AsOfJoin.leftAsOf(trades, updates, "sym", "ts", Seq("price"))
      .select("trade", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(got("t1").isEmpty)
    assert(got("t2").contains(2.0))
    assert(got("t3").contains(2.0))
    assert(got("t4").contains(3.0))
    assert(got("t5").isEmpty)
    assert(got("t6").contains(9.0))
    assert(got("t7").isEmpty)
  }

  test("left columns survive untouched and row count is |L|") {
    val out = AsOfJoin.leftAsOf(trades, updates, "sym", "ts", Seq("price"))
    assert(out.count() == 7)
    assert(out.columns.toSeq == Seq("trade", "sym", "ts", "asof_price"))
  }

  test("forward direction: earliest right.ts >= left.ts, ties inclusive") {
    val got = AsOfJoin.leftAsOf(trades, updates, "sym", "ts", Seq("price"),
        forward = true)
      .select("trade", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(got("t1").contains(1.0))  // next update at ts=10
    assert(got("t2").contains(2.0))  // exactly at update → inclusive
    assert(got("t3").contains(3.0))  // next is ts=30
    assert(got("t4").isEmpty)        // nothing after ts=99
    assert(got("t5").contains(9.0))
    assert(got("t6").isEmpty)
    assert(got("t7").isEmpty)
  }

  test("multiple payload columns attach together") {
    val upd2 = updates.withColumn("src", org.apache.spark.sql.functions.lit("u"))
    val out = AsOfJoin.leftAsOf(trades, upd2, "sym", "ts", Seq("price", "src"))
      .select("trade", "asof_price", "asof_src")
      .as[(String, Option[Double], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("t4") == (Some(3.0), Some("u")))
    assert(out("t1") == (None, None))
  }
}
