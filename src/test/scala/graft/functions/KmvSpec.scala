package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV / bottom-k sketch laws: the hash is a permutation, the sketch is the
  * true bottom-k (vs a brute-force sort), slice sketches merge LOSSLESSLY
  * into the whole-corpus sketch (the 100 TB daily→monthly pattern), the
  * estimator lands inside its advertised error on a large synthetic set,
  * and the weighted priority samples ∝ weight.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("hash is a permutation on [0, P): injective on a dense prefix") {
    val n = 100000
    val hs = (0L until n).map(Kmv.hash)
    assert(hs.distinct.length == n, "hash collided on distinct keys < P")
    assert(hs.forall(h => h >= 0 && h < Kmv.P))
  }

  test("hashCol matches the JVM hash bit-for-bit") {
    val keys = Seq(0L, 1L, 17L, 123456789L, Kmv.P - 1, Kmv.P, Kmv.P + 5)
    val got = keys.toDF("k").select(Kmv.hashCol(col("k"))).as[Long].collect()
    assert(got.toSeq == keys.map(Kmv.hash))
  }

  test("sketch is the exact bottom-k of the hash values") {
    val keys = (0L until 5000L).map(x => x * 37 % 4999)
    val sk = keys.toDF("k").repartition(8)
      .agg(Kmv.kmv(64)(col("k"))).as[Seq[Long]].head()
    val brute = keys.map(Kmv.hash).distinct.sorted.take(64)
    assert(sk == brute)
  }

  test("merge law: sketches of disjoint slices merge into the whole's sketch") {
    val df = spark.range(20000).select((col("id") * 7919 % 99991).as("k"),
      (col("id") % 16).as("slice"))
    val whole = df.agg(Kmv.kmv(128)(col("k"))).as[Seq[Long]].head()
    // per-slice sketches, merged by re-aggregating the union of their values
    // through the same aggregator (merge path exercised by the partial aggs)
    val sliced = df.groupBy("slice").agg(Kmv.kmv(128)(col("k")).as("sk"))
      .select(explode(col("sk")).as("h"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, 128))
      .as[Seq[Long]].head()
    assert(sliced == whole, "slice-merged sketch differs from direct sketch")
  }

  test("distinct estimate within 3/sqrt(k-2) relative error on 50k distinct") {
    val nd = 50000L
    val est = spark.range(nd).select((col("id") * 2654435761L % 100000000L).as("k"))
      .agg(Kmv.kmv(256)(col("k")).as("sk"))
      .select(Kmv.estimate(col("sk"), 256)).as[Double].head()
    // keys are distinct (2654435761 is odd, domain 1e8 > nd ⇒ injective here)
    val rel = math.abs(est - nd) / nd.toDouble
    assert(rel <= 3.0 / math.sqrt(254.0), s"estimate $est vs $nd: rel err $rel")
  }

  test("bottomK sample carries the payloads of the k smallest-hash keys") {
    val rows = (0L until 3000L).map(x => (x, x * 2.5))
    val got = rows.toDF("k", "p").repartition(8)
      .agg(Kmv.bottomK(32)(col("k"), col("p"))).as[Seq[Double]].head()
    val brute = rows.map { case (k, p) => (Kmv.hash(k), p) }
      .sortBy(_._1).take(32).map(_._2)
    assert(got == brute)
  }

  test("weighted priority: top-k share grows ~linearly with integer weight") {
    // 30k keys, weights 1..5 round-robin; in an ES-weighted sample the
    // expected top-3000 share of weight-w keys is ~ w / Σw per key group.
    val df = spark.range(30000)
      .select(col("id").as("k"), (col("id") % 5 + 1).as("w"))
      .withColumn("pri", Kmv.weightedPriority(col("k"), col("w")))
    val top = df.orderBy(col("pri").desc).limit(3000)
      .groupBy("w").count().as[(Long, Long)].collect().toMap
    // weight-5 keys must be sampled far more often than weight-1 keys —
    // expected ratio 5, generous band for a single deterministic draw
    val r = top(5L).toDouble / top(1L)
    assert(r > 2.5 && r < 10.0, s"weight-5/weight-1 sample ratio $r, top=$top")
    // monotone in w
    assert((1L to 4L).forall(w => top(w) <= top(w + 1)),
      s"top-k share not monotone in weight: $top")
  }

  test("64-bit domain: keys P apart collide under hash, never under hash64") {
    // the exact failure the mod-P precondition documents: x and x+P hash
    // identically, so the narrow sketch silently dedups them; hash64 is a
    // bijection on longs, so the wide sketch keeps both
    val xs = Seq(5L, 5L + Kmv.P, 7L, 7L + 2 * Kmv.P)
    assert(xs.map(Kmv.hash).distinct.length == 2, "mod-P collision expected")
    assert(xs.map(Kmv.hash64).distinct.length == 4, "hash64 must not collide")
    val narrow = xs.toDF("k").agg(Kmv.kmv(8)(col("k"))).as[Seq[Long]].head()
    val wide = xs.toDF("k").agg(Kmv.kmv64(8)(col("k"))).as[Seq[Long]].head()
    assert(narrow.length == 2, s"narrow sketch dedups the collisions: $narrow")
    assert(wide.length == 4, s"wide sketch must keep all four keys: $wide")
  }

  test("wide sketch/sample are the exact bottom-k of splitmix64 on >2^31 keys") {
    val keys = (1L to 4000L).map(_ * 4294967311L) // all beyond 2^32
    val sk = keys.toDF("k").repartition(8)
      .agg(Kmv.kmv64(64)(col("k"))).as[Seq[Long]].head()
    assert(sk == keys.map(Kmv.hash64).sorted.take(64))
    val got = keys.map(k => (k, k.toDouble)).toDF("k", "p").repartition(8)
      .agg(Kmv.bottomK64(32)(col("k"), col("p"))).as[Seq[Double]].head()
    val brute = keys.map(k => (Kmv.hash64(k), k.toDouble))
      .sortBy(_._1).take(32).map(_._2)
    assert(got == brute)
  }

  test("64-bit distinct estimate within 3/sqrt(k-2) on 50k distinct wide keys") {
    val nd = 50000L
    val est = spark.range(1, nd + 1)
      .select((col("id") * 4294967311L).as("k"))
      .agg(Kmv.kmv64(256)(col("k")).as("sk"))
      .select(Kmv.estimate64(col("sk"), 256)).as[Double].head()
    val rel = math.abs(est - nd) / nd.toDouble
    assert(rel <= 3.0 / math.sqrt(254.0), s"estimate $est vs $nd: rel err $rel")
  }
}
