package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SortedLongInterCount (r9): the LSH-verify merge primitive. Checked against
  * the builtin array_intersect size on sorted distinct inputs, on both the
  * interpreted (eval) and codegen paths, plus boundary shapes.
  */
class SortedInterCountSpec extends SparkSpec {
  import spark.implicits._

  private def inter(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.bridge.column(SortedLongInterCount(
      org.apache.spark.sql.graft.bridge.expression(x),
      org.apache.spark.sql.graft.bridge.expression(y)))

  test("matches size(array_intersect) on random sorted distinct arrays") {
    val rows = (0 until 200).map { i =>
      val a = (0 until 50).map(j => ((i * 31 + j * 17) % 97).toLong).distinct.sorted
      val b = (0 until 50).map(j => ((i * 13 + j * 29) % 97).toLong).distinct.sorted
      (a, b)
    }
    val bad = rows.toDF("a", "b")
      .select(inter(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("boundary shapes: empty, disjoint, identical, subset, null") {
    val df = Seq(
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L))),        // empty left
      (Some(Seq(1L, 3L, 5L)), Some(Seq(2L, 4L, 6L))),    // disjoint
      (Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 2L, 3L))),    // identical
      (Some(Seq(2L, 3L)), Some(Seq(1L, 2L, 3L, 4L))),    // subset
      (None: Option[Seq[Long]], Some(Seq(1L)))            // null left
    ).toDF("a", "b")
    val r = df.select(inter(col("a"), col("b")).as("n")).collect()
    assert(r(0).getLong(0) == 0L)
    assert(r(1).getLong(0) == 0L)
    assert(r(2).getLong(0) == 3L)
    assert(r(3).getLong(0) == 2L)
    assert(r(4).isNullAt(0))
  }

  test("negative longs merge correctly (signed comparison)") {
    val df = Seq((Seq(-5L, -1L, 3L), Seq(-5L, 0L, 3L))).toDF("a", "b")
    assert(df.select(inter(col("a"), col("b"))).head.getLong(0) == 2L)
  }
}
