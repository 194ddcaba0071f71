package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering: the Morton interleave matches a reference bit
  * computation, and — the point of the operator — a z-ordered layout prunes
  * a 2-D box predicate that a linear-sorted layout cannot, measured from the
  * scan node's output rows exactly like LayoutSpec does for 1-D ranges.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the reference bit computation") {
    val rows = for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y, 8), s"interleave($x, $y) = $z")
    }
  }

  test("interleave is a bijection on the 2-D grid") {
    val n = 1 << 7 // 128 × 128 grid, 14-bit keys
    val zs = spark.range(n.toLong * n)
      .select(ZOrder.interleave(col("id") % n,
        floor(col("id") / n).cast("long"), 7).as("z"))
      .distinct().count()
    assert(zs == n.toLong * n)
  }

  test("z-ordered layout prunes a 2-D box that a linear sort cannot") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    // 256 × 256 uniform grid — every (x, y) once
    val grid = spark.range(65536L)
      .select((col("id") % 256).as("x"),
        floor(col("id") / 256).cast("long").as("y"))
    ZOrder.writeZOrdered(grid, s"$dir/zorder", "x", "y", 8, 16)
    // adversarial baseline: linear sort on x only (perfect x stats, useless
    // y stats — the classic single-column clustering failure mode)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")

    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("x").between(10, 25) && col("y").between(10, 25))
      // collect() (not count()) so the metrics below come from THIS execution
      assert(df.collect().length == 16 * 16, "box predicate must return the box")
      val scans = df.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    }
    val z = scannedRows(s"$dir/zorder")
    val linear = scannedRows(s"$dir/linear")
    assert(z < linear,
      s"z-order scanned $z rows, linear $linear — no 2-D pruning win")
  }

  test("writeZOrdered round-trips the data unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("zorder2").toString
    val grid = spark.range(10000L)
      .select((col("id") % 100).as("x"),
        floor(col("id") / 100).cast("long").as("y"))
    ZOrder.writeZOrdered(grid, s"$dir/t", "x", "y", 7, 4)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 10000L)
    assert(back.columns.sorted.toSeq == Seq("x", "y"), "helper column leaked")
    assert(back.except(grid).isEmpty && grid.except(back).isEmpty)
  }

  test("writeZOrdered tolerates null key columns (null keys land in file 0)") {
    // ADVICE r9: a null xCol/yCol makes the Morton key null; the bucket cast
    // must coalesce to 0 instead of NPE-ing in the partitioner's getInt.
    val dir = java.nio.file.Files.createTempDirectory("zorder3").toString
    val grid = spark.range(1000L)
      .select(when(col("id") % 97 === 0, lit(null)).otherwise(col("id") % 25)
          .cast("long").as("x"),
        floor(col("id") / 40).cast("long").as("y"))
    ZOrder.writeZOrdered(grid, s"$dir/t", "x", "y", 5, 4)
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 1000L)
    assert(back.filter(col("x").isNull).count() ==
      grid.filter(col("x").isNull).count())
    assert(back.except(grid).isEmpty && grid.except(back).isEmpty)
  }
}
