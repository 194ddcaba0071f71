package graft.dedup

import graft.SparkSpec

/** MinHash banded-LSH and SimHash near-duplicate detection. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep dark forest to find some food for dinner " +
    "while the moon rises slowly over the quiet hills in the cold night air"
  private val nearDup = base.replace("cold night", "warm evening")
  private val unrelated = "completely different subject matter entirely about " +
    "quantum chromodynamics lattice computations on supercomputers with gauge " +
    "field configurations sampled via hybrid monte carlo trajectories at scale"

  private lazy val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base)
  ).toDF("doc_id", "text")

  test("MinHash near-dup finds planted duplicates, not unrelated text") {
    val got = MinHashDedup.nearDupPairs(docs,
      MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.5))
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), "near-dup pair missed")
    assert(got.contains((1L, 4L)), "exact dup pair missed")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "false positive on unrelated doc")
  }

  test("MinHash signature is deterministic and length numHashes") {
    import org.apache.spark.sql.functions._
    val sig = docs.select(
      MinHashDedup.signature(
        MinHashDedup.shingleHashes(col("text"), 3), 16).as("sig"))
      .head().getSeq[Long](0)
    val sig2 = docs.select(
      MinHashDedup.signature(
        MinHashDedup.shingleHashes(col("text"), 3), 16).as("sig"))
      .head().getSeq[Long](0)
    assert(sig.length == 16)
    assert(sig == sig2)
    assert(sig.forall(s => s >= 0 && s < (1L << 31) - 1))
  }

  test("MinHash empty text gets sentinel signature, no self-collision pairs") {
    val withEmpty = Seq((1L, ""), (2L, ""), (3L, base)).toDF("doc_id", "text")
    val got = MinHashDedup.nearDupPairs(withEmpty,
      MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.5))
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // two empty docs DO collide in every band (identical sentinel signatures)
    // but exact-Jaccard verify on empty token sets is null/0 → filtered out
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("SimHash near-dup: identical and near texts within distance, unrelated beyond") {
    val got = SimHash.nearDupPairs(docs, SimHash.Config(maxHammingDistance = 6))
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 4L)), "identical docs must be at distance 0")
    assert(got.contains((1L, 2L)), "near-dup should be within hamming 6")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "false positive on unrelated doc")
  }

  test("simhash of identical texts equal; hamming64 correct") {
    import org.apache.spark.sql.functions._
    val sigs = docs.filter($"doc_id".isin(1L, 4L))
      .select(SimHash.simhash(graft.text.TextOps.tokens(col("text"))).as("s"))
      .as[Long].collect()
    assert(sigs(0) == sigs(1))
    val d = Seq((3L, 5L)).toDF("a", "b")
      .select(SimHash.hamming64(col("a"), col("b"))).as[Long].head()
    assert(d == 2) // 011 xor 101 = 110
  }

  test("dedupExact keeps smallest id per distinct text") {
    val got = MinHashDedup.dedupExact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L)) // 4 is a copy of 1
  }

  test("dedupAgainst drops exact, near, and short-exact dups; keeps the rest") {
    // corpus: base + an under-shingle-length snippet (empty 3-gram set)
    val corpus = Seq((10L, base), (11L, "tiny doc")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),           // exact dup of 10 → exact gate
      (2L, nearDup),        // near dup of 10 → jaccard gate
      (3L, unrelated),      // unique → survives
      (4L, "tiny doc")      // exact dup of 11; jac = 0 on empty shingle sets,
                            // only the content-hash gate can catch it
    ).toDF("doc_id", "text")
    val got = MinHashDedup.dedupAgainst(batch, corpus,
        MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(3L))
  }

  test("dedupAgainst reuses a prebuilt corpus sketch; batch/corpus ids may overlap") {
    val cfg = MinHashDedup.Config(shingleSize = 3, jaccardThreshold = 0.5)
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val sk = MinHashDedup.sketch(corpus, cfg)
    val hashes = corpus.select(
      org.apache.spark.sql.functions.md5($"text".cast("binary")).as("__h"))
    // batch id 1 collides with corpus id 1 on purpose — pair keys are
    // (batch id, corpus id), never compared for order
    val batch = Seq((1L, unrelated), (2L, nearDup)).toDF("doc_id", "text")
    val got = MinHashDedup.dedupAgainst(batch, sk, hashes, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
