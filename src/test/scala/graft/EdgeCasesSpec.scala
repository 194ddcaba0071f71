package graft

import graft.candidates.{CandidateConfig, Candidates}
import graft.dedup.{MinHashDedup, SimHash}
import graft.graph.GraphOps
import graft.post.Post
import graft.similarity.ArrayOps
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Degenerate-input behavior across the library: empty frames, empty
  * arrays/strings, single elements — the failure modes that surface only in
  * production partitions (empty partitions are routine at 1000 executors). */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup operators return empty results on empty input") {
    assert(MinHashDedup.nearDupPairs(emptyDocs,
      MinHashDedup.Config(shingleSize = 3)).count() == 0)
    assert(SimHash.nearDupPairs(emptyDocs).count() == 0)
    assert(MinHashDedup.dedupExact(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("candidate pairs on empty and single-row inputs") {
    val empty = Seq.empty[(String, String, Int)].toDF("pk", "state", "prediction")
    val one = Seq(("a", "FL", 0)).toDF("pk", "state", "prediction")
    val cfg = CandidateConfig(keyCol = "pk", groupCol = "state")
    assert(Candidates.pairs(empty, cfg).count() == 0)
    assert(Candidates.pairs(one, cfg).count() == 0)
  }

  test("graph operators on empty edge lists") {
    val none = Seq.empty[(Long, Long)].toDF("src", "dst")
    val canonical = GraphOps.canonicalEdges(none, "src", "dst")
    assert(GraphOps.triangleCounts(canonical).count() == 0)
    assert(GraphOps.pageRankDF(canonical, 3).count() == 0)
    assert(GraphOps.connectedComponents(canonical).count() == 0)
  }

  test("text ops on empty strings") {
    val r = Seq("").toDF("t").select(
      TextOps.tokens(col("t")).as("toks"),
      TextOps.langId(col("t")).as("lang"),
      TextOps.tokenCount(col("t")).as("n"),
      TextOps.fingerprint(col("t")).as("fp")).head()
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getString(1) == "und")
    assert(r.getInt(2) == 0)
    assert(r.getString(3) == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
    val grams = Seq(Seq.empty[String]).toDF("toks")
      .select(TextOps.ngrams(col("toks"), 3)).head().getSeq[String](0)
    assert(grams.isEmpty)
  }

  test("ArrayOps on zero vectors: cosine is NaN, not an exception") {
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = z.select(ArrayOps.cosine(col("a"), col("b")).as("c")).head()
    assert(r.getDouble(0).isNaN)
  }

  test("Post.topK with k larger than input; canonical order on single-token keys") {
    val p = Seq(("x_1", "y_2", 5.0)).toDF("pk1", "pk2", "similarity")
    assert(Post.topK(p, 100).count() == 1)
    val c = Post.imposeCanonicalOrder(
      Seq(("b", "a", 1.0)).toDF("pk1", "pk2", "similarity"))
      .select("pk_smaller", "pk_larger").as[(String, String)].head()
    assert(c == ("a", "b"))
  }

  test("minhash signature of empty shingle set is the sentinel, not a crash") {
    val sig = Seq("").toDF("t")
      .select(MinHashDedup.signature(
        MinHashDedup.shingleHashes(col("t"), 3), 16).as("s"))
      .head().getSeq[Long](0)
    assert(sig.forall(_ == (1L << 31) - 1))
  }
}
