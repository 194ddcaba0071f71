package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PrefixJoin = the AllPairs/PPJoin exact set-similarity join. The spec's
  * oracle is an INDEPENDENT driver-side brute force over Scala Sets (no
  * engine kernels, no prefix math) — completeness of the size+prefix filter
  * chain and correctness of the merge-verify are both on trial. */
class PrefixJoinSpec extends SparkSpec {

  /** (id → shingle-id set) via plain Scala — independent of the engine's
    * column expressions except tokenization, which is shared vocabulary. */
  private def bruteSets(w: Int): Map[Long, Set[Long]] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        MinHashDedup.shingleIds(col("text"), w).as("s"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap

  private def brutePairs(sets: Map[Long, Set[Long]], tau: Double): Set[(Long, Long, Double)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      if a.nonEmpty && b.nonEmpty
      inter = (a intersect b).size
      jac = inter.toDouble * 100.0 / (a.size + b.size - inter)
      if jac >= tau * 100.0
    } yield (ids(i), ids(j),
      BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  private def enginePairs(tau: Double, w: Int = 3): Set[(Long, Long, Double)] =
    PrefixJoin.allPairs(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        PrefixJoin.Config(shingleSize = w, jaccardThreshold = tau))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("exact parity with driver brute force at tau=0.7") {
    val sets = bruteSets(3)
    assert(enginePairs(0.7) == brutePairs(sets, 0.7))
  }

  test("exact parity at a low threshold (prefix math stress, tau=0.25)") {
    // low tau makes prefixes long and the ceil() boundary arithmetic the
    // failure surface; output must STILL be the exact answer set
    val sets = bruteSets(3)
    val got = enginePairs(0.25)
    val want = brutePairs(sets, 0.25)
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("tau=1.0 degenerates to exact-duplicate sets (prefix length 1)") {
    val sets = bruteSets(3)
    assert(enginePairs(1.0) == brutePairs(sets, 1.0))
  }

  test("dedupAgainst survivors match driver brute force (incremental shape)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sets = bruteSets(3)
    val batchIds = texts.keys.filter(_ % 4 == 0).toSeq.sorted
    val corpusIds = texts.keys.filter(_ % 4 != 0).toSet
    val want = batchIds.filter { b =>
      !corpusIds.exists(c => texts(c) == texts(b)) &&
      !corpusIds.exists { c =>
        val (x, y) = (sets(b), sets(c))
        x.nonEmpty && y.nonEmpty && {
          val i = (x intersect y).size
          i.toDouble * 100.0 / (x.size + y.size - i) >= 70.0
        }
      }
    }.toSet
    val got = PrefixJoin.dedupAgainst(
        docs.filter(col("doc_id") % 4 === 0),
        docs.filter(col("doc_id") % 4 =!= 0),
        PrefixJoin.Config(shingleSize = 3, jaccardThreshold = 0.7))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"got ${got.size} survivors, want ${want.size}")
  }

  test("randomized corpora keep brute-force parity (positional-filter fuzz)") {
    // r10 added the PPJoin positional filter; this fuzz drives it through
    // shapes the fixture lacks — tiny docs (1-3 tokens), heavy overlap
    // clusters, singletons — at thresholds that stress both the prefix and
    // the overlap-bound ceil() arithmetic. Seeded: reproducible failures.
    val rnd = new scala.util.Random(20260815L)
    val vocab = (1 to 40).map(i => s"w$i")
    val texts = (0L until 80L).map { id =>
      // cluster seeds every 8 ids; members mutate a few tokens, so true
      // near-dup pairs exist at several similarity levels
      val seed = (id / 8) * 8
      val base = new scala.util.Random(seed + 1).shuffle(vocab)
        .take(3 + (seed % 12).toInt)
      val mutated = base.map(w =>
        if (rnd.nextDouble() < 0.15) vocab(rnd.nextInt(vocab.size)) else w)
      id -> mutated.mkString(" ")
    }
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
    val sets = df
      .select(col("doc_id"), MinHashDedup.shingleIds(col("text"), 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    for (tau <- Seq(0.3, 0.6, 0.85)) {
      val got = PrefixJoin.allPairs(df,
          PrefixJoin.Config(shingleSize = 2, jaccardThreshold = tau))
        .select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = brutePairs(sets, tau).map(t => (t._1, t._2))
      assert(got == want,
        s"tau=$tau: got ${got.size} pairs, want ${want.size}; " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("allPairsOnSets with a block column equals per-block brute force") {
    // r13: the blocked variant (q_jaccard_pairs' shape) must report exactly
    // the within-block pairs at jac ≥ the cut — fuzz against a brute-force
    // per-block set computation, including blocks of size 1 and empty sets.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0L until 120L).map { i =>
      val lang = s"l${rnd.nextInt(3)}"
      val base = Seq.tabulate(6 + rnd.nextInt(10))(j => s"w${rnd.nextInt(40)}")
      val text = if (i % 17 == 0) "" else base.mkString(" ")
      (i, lang, text)
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val sets = df.select(col("doc_id"), col("lang"),
        MinHashDedup.shingleIds(col("text"), 1).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[Long](2).toSet))
    val want = (for {
      (d1, l1, s1) <- sets; (d2, l2, s2) <- sets
      if d1 < d2 && l1 == l2 && (s1 ++ s2).nonEmpty
      jac = s1.intersect(s2).size.toDouble * 100.0 / (s1 ++ s2).size
      if jac >= 50.0
    } yield (d1, d2)).toSet
    val got = PrefixJoin.allPairsOnSets(
        df.select(col("doc_id"), col("lang"),
          org.apache.spark.sql.functions.array_sort(
            MinHashDedup.shingleIds(col("text"), 1)).as("sids")),
        "doc_id", "sids", tau = 0.5, minJacPct = 50.0,
        blockCol = Some("lang"))
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"got ${got.size} want ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // and the unblocked form over the same sets is a superset
    val unblocked = PrefixJoin.allPairsOnSets(
        df.select(col("doc_id"),
          org.apache.spark.sql.functions.array_sort(
            MinHashDedup.shingleIds(col("text"), 1)).as("sids")),
        "doc_id", "sids", tau = 0.5, minJacPct = 50.0)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(unblocked))
  }

  test("finds every pair the banded MinHash join reports (superset proof)") {
    // MinHashDedup.nearDupPairs is approximate-by-banding with the same
    // exact verify: its survivors are true near-dups, so the exact join
    // must report every one of them (equality would additionally require
    // banding recall = 1, which is not guaranteed)
    val banded = MinHashDedup.nearDupPairs(
        spark.read.parquet(s"$sfDir/documents.parquet"),
        MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.7))
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = enginePairs(0.7).map(t => (t._1, t._2))
    assert(banded.subsetOf(exact))
  }
}
