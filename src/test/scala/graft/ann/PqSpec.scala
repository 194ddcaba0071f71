package graft.ann

import graft.SparkSpec
import graft.io.Tables
import graft.similarity.ArrayOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization contract: lossless when the code alphabet covers all
  * distinct subvectors (PQ ranking == exact L2 ranking), sane recall on real
  * embeddings, m-byte code shape.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  test("quantization is lossless when k covers the distinct subvectors") {
    // 3 distinct patterns per 2-dim subspace, 4 subspaces, k=4 > 3
    val patterns = Seq(Seq(0.0, 1.0), Seq(5.0, 2.0), Seq(-3.0, 4.0))
    val vecs = (0 until 60).map { i =>
      val v = (0 until 4).flatMap(j => patterns((i / (j + 1)) % 3))
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "v").repartition(4)
    val index = Pq.build(df, "vec_id", "v", m = 4, k = 4)
    val probes = df.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val got = Pq.search(index, probes, topK = 5)
      .select("q_id", "rn", "cand_id", "approx_d2")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4))).toMap

    // exact L2 reference with the same tie-break (d2 asc, cand_id asc)
    val all = vecs.toMap
    val exact = (0L until 5L).map { q =>
      val qv = all(q)
      q -> vecs.filter(_._1 != q).map { case (id, v) =>
        (id, v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d2) => (d2, id) }.take(5)
    }.toMap
    got.foreach { case (q, cands) =>
      assert(cands.map(_._1).toSeq == exact(q).map(_._1).toSeq, s"ranking differs for q=$q")
      cands.zip(exact(q)).foreach { case ((_, gd), (_, ed)) =>
        assert(math.abs(gd - ed) < 1e-9, s"lossless distance mismatch q=$q")
      }
    }
  }

  test("fromCodebooks encodes by per-subspace argmin — lossless on a covering alphabet") {
    val patterns = Seq(Seq(0.0, 1.0), Seq(5.0, 2.0), Seq(-3.0, 4.0))
    val vecs = (0 until 60).map { i =>
      val v = (0 until 4).flatMap(j => patterns((i / (j + 1)) % 3))
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "v").repartition(4)
    // explicit codebooks that cover every distinct subvector exactly —
    // encoding must hit each pattern at distance 0, so PQ == exact L2
    val books = Array.tabulate(4, 3)((_, c) => patterns(c).toArray)
    val index = Pq.fromCodebooks(df, "vec_id", "v", books)
    // each code must name the exact source pattern
    val decoded = index.codes.as[(Long, Seq[Int])].collect().toMap
    vecs.foreach { case (id, v) =>
      val rebuilt = decoded(id).toSeq.flatMap(c => patterns(c))
      assert(rebuilt == v, s"fromCodebooks mis-encoded vec $id")
    }
    val probes = df.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val got = Pq.search(index, probes, topK = 5)
      .select("q_id", "rn", "cand_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val all = vecs.toMap
    (0L until 5L).foreach { q =>
      val qv = all(q)
      val exact = vecs.filter(_._1 != q).map { case (id, v) =>
        (id, v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (id, d2) => (d2, id) }.take(5).map(_._1)
      assert(got(q) == exact, s"fromCodebooks ranking differs for q=$q")
    }
  }

  test("codes are m small ints; recall on real embeddings is nontrivial") {
    val t = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), ArrayOps.asDouble(col("embedding")).as("v"))
      .repartition(32)
    val index = Pq.build(t, "vec_id", "v", m = 8, k = 16)
    val shape = index.codes.select(size(col("codes"))).distinct()
      .as[Int].collect().toSeq
    assert(shape == Seq(8))

    val probes = t.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"v".as("qv"))
    val pqTop = Pq.search(index, probes, topK = 10)
      .select("q_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // exact L2 top-10 per probe
    val d2 = ArrayOps.norm2sq(col("qv")) + ArrayOps.norm2sq(col("v")) -
      lit(2.0) * ArrayOps.dot(col("qv"), col("v"))
    val w = Window.partitionBy("q_id").orderBy(asc("d2"), asc("cand_id"))
    val exactTop = probes.crossJoin(t).filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id".as("cand_id"), d2.as("d2"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select("q_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = exactTop.map { case (q, ex) =>
      pqTop(q).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(s"mean recall@10 = $mean")
    // "nontrivial" bar: chance recall@10 over ~500 candidates is ~0.02; the
    // 8×16 codebook lands ~0.28-0.33 on these synthetic embeddings (the
    // r12 hash-ordered deterministic sample fit sits at 0.28, the r11
    // id-prefix sample at 0.29, the old distributed fit at 0.31 — same
    // quality class, different local optimum; extra Lloyd iterations don't
    // move it, and on these uniform synthetic vectors the sample ORDER only
    // picks among optima — the hash order exists to kill the id-content
    // correlation bias a prefix sample has on real corpora, ADVICE r11).
    // 0.2 asserts an order of magnitude above chance without pinning a
    // specific local optimum.
    assert(mean > 0.2, s"mean recall@10 too low: $mean (per-probe: $recalls)")
  }
}
