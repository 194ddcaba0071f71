package graft.ann

import graft.SparkSpec
import graft.io.Tables
import graft.similarity.ArrayOps
import org.apache.spark.sql.functions._

/** IVF-PQ composition contract: with every partition probed (nProbe == k)
  * and a lossless code alphabet, the composed search equals exact L2; with
  * real routing the candidate set shrinks to the probed partitions only.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("nProbe == k + lossless codes ⇒ exact L2 ranking") {
    val patterns = Seq(Seq(0.0, 1.0), Seq(5.0, 2.0), Seq(-3.0, 4.0))
    val vecs = (0 until 60).map { i =>
      val v = (0 until 4).flatMap(j => patterns((i / (j + 1)) % 3))
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "v").repartition(4)
    val ivf = Ivf.build(df, "v", k = 4)
    val pq = Pq.build(df, "vec_id", "v", m = 4, k = 4)
    val probes = df.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val got = IvfPq.search(ivf, pq, probes, "vec_id", topK = 5, nProbe = 4)
      .select("q_id", "rn", "cand_id", "approx_d2")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4))).toMap

    val all = vecs.toMap
    (0L until 5L).foreach { q =>
      val qv = all(q)
      val exact = vecs.filter(_._1 != q).map { case (id, v) =>
        (id, v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d2) => (d2, id) }.take(5)
      assert(got(q).map(_._1).toSeq == exact.map(_._1).toSeq,
        s"ranking differs for q=$q")
      got(q).zip(exact).foreach { case ((_, gd), (_, ed)) =>
        assert(math.abs(gd - ed) < 1e-9, s"lossless distance mismatch q=$q")
      }
    }
  }

  test("routing restricts candidates to the probed partitions") {
    val t = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))
      .repartition(32)
    val ivf = Ivf.build(t, "v", k = 8)
    val pq = Pq.build(t, "vec_id", "v", m = 8, k = 16)
    val probes = t.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val out = IvfPq.search(ivf, pq, probes, "vec_id", topK = 5, nProbe = 2)
    val byCand = out.join(
        ivf.assigned.select($"vec_id".as("cand_id"), $"centroid_id"), "cand_id")
      .select("q_id", "centroid_id").distinct()
      .as[(Long, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byCand.foreach { case (q, cents) =>
      assert(cents.size <= 2, s"probe $q drew candidates from $cents (> nProbe)")
    }
    // every probe still fills its top-k (enough candidates in 2 partitions)
    val counts = out.groupBy("q_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 5L), s"short top-k: $counts")
  }
}
