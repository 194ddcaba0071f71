package graft.candidates

import graft.SparkSpec

/** Blocked candidate-pair self-join (SURVEY J2) — predicate semantics of the
  * reference's `pairup` (reference feature/Utils.scala:46-105). */
class CandidatesSpec extends SparkSpec {
  import spark.implicits._

  // (pk, state, cluster, length)
  private lazy val docs = Seq(
    ("a", "FL", 0, 1000L),
    ("b", "SC", 0, 1100L),
    ("c", "MI", 0, 5000L),
    ("d", "FL", 1, 1000L),
    ("e", "SC", 1, 1000L),
    ("f", "FL", 0, 1050L)
  ).toDF("pk", "state", "prediction", "length")

  private val base = CandidateConfig(keyCol = "pk", groupCol = "state")

  test("pairs: same block, different state, pk1 < pk2") {
    val got = Candidates.pairs(docs, base)
      .as[(String, String)].collect().toSet
    // block 0: {a,b,c,f}: ab,ac,bc,bf,cf (af same state FL) — block 1: de
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c"), ("b", "f"), ("c", "f"), ("d", "e")))
  }

  test("no blocking column → cross-block pairs appear") {
    val got = Candidates.pairs(docs, base.copy(blockCol = None))
      .as[(String, String)].collect().toSet
    assert(got.contains(("a", "d")) === false) // same state FL
    assert(got.contains(("a", "e")))           // cross-block FL-SC
    assert(got.contains(("c", "d")))
  }

  test("length-ratio band prunes lopsided pairs") {
    val got = Candidates.pairs(docs,
      base.copy(lengthCol = Some("length"), maxLengthRatio = 0.26))
      .as[(String, String)].collect().toSet
    // |1000-5000|/sqrt(1000*5000) = 1.78 > 0.26 → (a,c) pruned
    assert(!got.contains(("a", "c")))
    assert(got.contains(("a", "b"))) // |1000-1100|/sqrt(1000*1100)=0.095
  }

  test("include list restricts the universe") {
    val got = Candidates.pairs(docs,
      base.copy(includeKeys = Some(Seq("a", "b", "c"))))
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("exclude list removes keys") {
    val got = Candidates.pairs(docs, base.copy(excludeKeys = Some(Seq("c"))))
      .as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("b", "f"), ("d", "e")))
  }

  test("pairsLevel0: onlyInOut=false canonicalizes each cross-state pair once") {
    val got = Candidates.pairsLevel0(docs, base, onlyInOut = false)
      .as[(String, String)].collect().toSet
    // brute force: all unordered cross-state pairs (no blocking at level 0)
    val rows = Seq(("a","FL"),("b","SC"),("c","MI"),("d","FL"),("e","SC"),("f","FL"))
    val want = (for {
      (p1, s1) <- rows; (p2, s2) <- rows
      if p1 < p2 && s1 != s2
    } yield (p1, p2)).toSet
    assert(got == want)
    assert(got.contains(("a", "e"))) // cross-block pair: level 0 ignores blocks
  }

  test("pairsLevel0: onlyInOut=true keeps BOTH orientations (reference pk1 != pk2)") {
    val both = Candidates.pairsLevel0(docs, base, onlyInOut = true)
      .as[(String, String)].collect().toSet
    val once = Candidates.pairsLevel0(docs, base, onlyInOut = false)
      .as[(String, String)].collect().toSet
    assert(both == once ++ once.map(_.swap))
    assert(both.size == 2 * once.size)
  }

  test("attachBothSides carries payload to both pair sides") {
    val pairs = Candidates.pairs(docs, base)
    val payload = docs.select($"pk", $"length".as("len"))
    val got = Candidates.attachBothSides(pairs, payload, "pk", "len")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("a", "b")) == (1000L, 1100L))
    assert(got(("c", "f")) == (5000L, 1050L))
  }
}
