package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val width = 64 // small width so collisions actually happen

  test("estimate never undercounts and respects the (e/w)·N band") {
    // zipfish key stream: key k appears 200/k times
    val rows = (1L to 40L).flatMap(k => Seq.fill((200 / k).toInt)(k))
    val df = rows.toDF("k")
    val sk = df.agg(CountMin.countMin(width)($"k").as("sk"),
      count(lit(1)).as("n_total"))
    val checked = df.groupBy("k").agg(count(lit(1)).as("n_exact"))
      .crossJoin(sk)
      .select($"k", $"n_exact",
        CountMin.estimate($"sk", $"k", width).as("est"),
        CountMin.errorBound($"n_total", width).as("bound"))
      .collect()
    assert(checked.length == 40)
    checked.foreach { r =>
      val (exact, est, bound) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, s"undercount for key ${r.getLong(0)}")
      assert(est <= exact + bound, s"band violation for key ${r.getLong(0)}")
    }
  }

  test("Column probe path agrees with the JVM hash (same indices)") {
    val keys = Seq(0L, 1L, 7L, Int.MaxValue.toLong, (1L << 40) + 3L)
    val idxCols = (0 until CountMin.Depth).map(i =>
      shiftrightunsigned(
        ($"k".bitwiseXOR(shiftrightunsigned($"k", 31))
          .bitwiseAND(lit(0xffffffffL)) * lit(CountMin.MulA(i)) +
          lit(CountMin.AddB(i))).bitwiseAND(lit(0xffffffffL)),
        32 - CountMin.log2(width)))
    val probed = keys.toDF("k").select(($"k" +: idxCols): _*).collect()
    probed.foreach { r =>
      val k = r.getLong(0)
      (0 until CountMin.Depth).foreach { i =>
        assert(r.getLong(1 + i) == CountMin.hashIdx(k, i, width).toLong,
          s"hash mismatch key=$k row=$i")
      }
    }
  }

  test("sketches of disjoint slices merge to exactly the whole-stream sketch") {
    val df = (1L to 500L).map(i => (i % 8, i % 37)).toDF("slice", "k")
    val slices = df.groupBy("slice")
      .agg(CountMin.countMin(width)($"k").as("sk"))
      .select("sk").as[Seq[Long]].collect()
    assert(slices.length == 8)
    val merged = slices.map(_.toArray)
      .reduce(new CountMin.Sketch(width).merge).toSeq
    val direct = df.agg(CountMin.countMin(width)($"k").as("sk"))
      .select("sk").as[Seq[Long]].head()
    assert(merged == direct)
  }

  test("empty input yields the zero sketch; estimate is then 0") {
    val sk = Seq.empty[Long].toDF("k")
      .agg(CountMin.countMin(width)($"k").as("sk"))
    val est = sk.select(CountMin.estimate($"sk", lit(123L), width)).head().getLong(0)
    assert(est == 0L)
  }
}
