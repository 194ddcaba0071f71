package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Point-in-interval range join: half-open semantics, exactly-once pairing,
  * and the plan-shape contract (hash equi-join on the bin, never a
  * nested-loop join).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  // intervals: [0h,1h), [0h30,1h30), [2h,3h) — first two overlap
  private lazy val intervals = Seq(
    ("w1", ts(0), ts(60)),
    ("w2", ts(30), ts(90)),
    ("w3", ts(120), ts(180))
  ).toDF("win", "start_ts", "end_ts")

  private lazy val points = Seq(
    ("p0", ts(0)),    // w1 only (w2 starts at 30)
    ("p1", ts(45)),   // w1 AND w2 (overlap region)
    ("p2", ts(60)),   // w2 only — end is EXCLUSIVE, not w1
    ("p3", ts(119)),  // no window (gap)
    ("p4", ts(120)),  // w3 start is inclusive
    ("p5", ts(180))   // w3 end is exclusive → no window
  ).toDF("pt", "ts")

  private def pairs(binSeconds: Long) =
    RangeJoin.pointInInterval(points, intervals, "ts", "start_ts", "end_ts",
        binSeconds)
      .select("pt", "win").as[(String, String)].collect().toSet

  private val expected = Set(
    "p0" -> "w1", "p1" -> "w1", "p1" -> "w2", "p2" -> "w2", "p4" -> "w3")

  test("half-open [start,end): starts inclusive, ends exclusive, overlaps " +
      "yield one row per matching interval") {
    assert(pairs(3600) == expected)
  }

  test("result is bin-width invariant (each pair exactly once, no dedup)") {
    // also as multisets: no duplicated pairs at any bin width
    for (w <- Seq(60L, 600L, 86400L)) {
      val rows = RangeJoin.pointInInterval(points, intervals,
          "ts", "start_ts", "end_ts", w)
        .select("pt", "win").as[(String, String)].collect().toSeq
      assert(rows.size == rows.toSet.size, s"duplicate pairs at bin=$w")
      assert(rows.toSet == expected, s"wrong pairs at bin=$w")
    }
  }

  test("interval overlap: open/closed edges, exactly-once across shared bins") {
    val lhs = Seq(
      ("a", ts(0), ts(100)),   // long: spans 2 bins at bin=3600s? no — minutes; overlaps b,c
      ("b", ts(150), ts(160))  // disjoint from rhs "y"
    ).toDF("l", "ls", "le")
    val rhs = Seq(
      ("x", ts(50), ts(200)),  // overlaps a (50..100) and b (150..160)
      ("y", ts(100), ts(110)), // touches a only at a's exclusive end → NO
      ("z", ts(0), ts(1))      // overlaps a at the very first minute
    ).toDF("r", "rs", "re")
    val expectedPairs = Set("a" -> "x", "b" -> "x", "a" -> "z")
    for (w <- Seq(60L, 1800L, 86400L)) {
      val rows = RangeJoin.intervalOverlap(lhs, rhs, "ls", "le", "rs", "re", w)
        .select("l", "r").as[(String, String)].collect().toSeq
      assert(rows.size == rows.toSet.size, s"duplicate pairs at bin=$w")
      assert(rows.toSet == expectedPairs, s"wrong pairs at bin=$w: $rows")
    }
  }

  test("fractional-second ends on a bin boundary still cover their final " +
      "partial second (micros bin arithmetic)") {
    // interval [01:59:59.0, 02:00:00.500): its last half second sits in the
    // 02:00 bin at binSeconds=3600. Second-granularity floor computed the
    // last bin from floor(7200.5)-1 = 7199 → bin 1, silently dropping any
    // point in [02:00:00.0, 02:00:00.5).
    val iv = Seq(("w", new Timestamp(7199000L), new Timestamp(7200500L)))
      .toDF("win", "start_ts", "end_ts")
    val pts = Seq(
      ("in", new Timestamp(7200200L)),   // 02:00:00.200 — inside
      ("out", new Timestamp(7200500L))   // exactly at the exclusive end
    ).toDF("pt", "ts")
    for (w <- Seq(1L, 60L, 3600L)) {
      val got = RangeJoin.pointInInterval(pts, iv, "ts", "start_ts", "end_ts", w)
        .select("pt", "win").as[(String, String)].collect().toSet
      assert(got == Set("in" -> "w"), s"bin=$w: $got")
    }
    // same bug shape in intervalOverlap: right interval living entirely in
    // the final partial second of the left one must still pair
    val lhs = Seq(("L", new Timestamp(0L), new Timestamp(7200500L)))
      .toDF("l", "ls", "le")
    val rhs = Seq(("R", new Timestamp(7200100L), new Timestamp(7200400L)))
      .toDF("r", "rs", "re")
    for (w <- Seq(60L, 3600L)) {
      val got = RangeJoin.intervalOverlap(lhs, rhs, "ls", "le", "rs", "re", w)
        .select("l", "r").as[(String, String)].collect().toSet
      assert(got == Set("L" -> "R"), s"bin=$w: $got")
    }
  }

  test("keyed variant: equi-key restricts pairs, key emitted once, and the " +
      "key joins the hash-join condition") {
    val iv = Seq(
      (1L, "w1", ts(0), ts(60)),
      (2L, "w2", ts(0), ts(60))
    ).toDF("uid", "win", "start_ts", "end_ts")
    val pts = Seq(
      (1L, "p0", ts(30)), // in both windows' time range — only w1 shares uid
      (2L, "p1", ts(30)),
      (3L, "p2", ts(30))  // no window for uid 3
    ).toDF("uid", "pt", "ts")
    for (w <- Seq(60L, 3600L)) {
      val df = RangeJoin.pointInInterval(pts, iv, "ts", "start_ts", "end_ts",
        w, keys = Seq("uid"))
      assert(df.columns.count(_ == "uid") == 1, "key must be emitted once")
      val got = df.select("pt", "win").as[(String, String)].collect().toSet
      assert(got == Set("p0" -> "w1", "p1" -> "w2"), s"bin=$w: $got")
    }
    // the key must be part of the equi-join (shuffle) key, not a post-filter:
    // both sides' key columns appear in the join's `keys` clause
    val df = RangeJoin.pointInInterval(pts, iv, "ts", "start_ts", "end_ts",
      3600, keys = Seq("uid"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val joinLine = plan.linesIterator.find(_.contains("HashJoin"))
      .orElse(plan.linesIterator.find(_.contains("SortMergeJoin")))
    assert(joinLine.exists(_.contains("uid")), s"key not in join keys: $joinLine")

    // keyed intervalOverlap: same uid-restriction + single key column
    val l = Seq((1L, "a", ts(0), ts(60)), (2L, "b", ts(0), ts(60)))
      .toDF("uid", "l", "ls", "le")
    val r = Seq((1L, "x", ts(30), ts(90)), (2L, "y", ts(30), ts(90)))
      .toDF("uid", "r", "rs", "re")
    val ov = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 3600,
      keys = Seq("uid"))
    assert(ov.columns.count(_ == "uid") == 1)
    assert(ov.select("l", "r").as[(String, String)].collect().toSet ==
      Set("a" -> "x", "b" -> "y"))
  }

  test("plan is a hash equi-join on the bin, not a nested-loop join") {
    val df = RangeJoin.pointInInterval(points, intervals,
      "ts", "start_ts", "end_ts", 3600)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
