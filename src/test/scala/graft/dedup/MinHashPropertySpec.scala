package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Statistical contract of the MinHash sketch, checked WITHOUT Spark: the
  * per-hash signature agreement rate is an unbiased estimator of the true
  * set Jaccard (the property the whole banded-LSH pipeline rests on).
  * Deterministic scalacheck sampling (fixed seed, no JVM RNG). */
class MinHashPropertySpec extends AnyFunSuite {

  private val P = (1L << 31) - 1
  private val numHashes = 128
  private val (as, bs) = MinHashDedup.coefficients(numHashes)

  /** Reference signature computation on a plain Long set (mirrors the
    * MinHashSignature expression's arithmetic exactly). */
  private def sig(shingles: Set[Long]): Array[Long] = {
    val out = Array.fill(numHashes)(P)
    for (h <- shingles; k <- 0 until numHashes) {
      val v = (as(k) * h + bs(k)) % P
      if (v < out(k)) out(k) = v
    }
    out
  }

  private def jaccard(a: Set[Long], b: Set[Long]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  private val genSet: Gen[Set[Long]] =
    Gen.chooseNum(20, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, P - 1)).map(_.toSet))

  /** Overlapping pair: sample a base set and perturb a fraction of it. */
  private val genPair: Gen[(Set[Long], Set[Long])] = for {
    base <- genSet
    keep <- Gen.chooseNum(0.3, 1.0)
    extra <- genSet
  } yield {
    val kept = base.filter(h => (h % 1000) < (keep * 1000).toLong)
    (base, kept ++ extra.take((base.size - kept.size).max(0)))
  }

  private val pairs: Seq[(Set[Long], Set[Long])] =
    Gen.listOfN(60, genPair).apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(sys.error("gen failed"))

  test("signature agreement estimates true jaccard within 4 standard errors") {
    for ((a, b) <- pairs if a.nonEmpty && b.nonEmpty) {
      val j = jaccard(a, b)
      val (sa, sb) = (sig(a), sig(b))
      val agree = (0 until numHashes).count(k => sa(k) == sb(k)).toDouble / numHashes
      val se = math.sqrt(j * (1 - j) / numHashes) + 1e-9
      assert(math.abs(agree - j) <= 4 * se + 0.02,
        f"jac=$j%.3f est=$agree%.3f (|Δ| > 4se=${4 * se}%.3f)")
    }
  }

  test("identical sets agree on every hash; disjoint sets agree on ~none") {
    val a = pairs.head._1
    assert(sig(a).sameElements(sig(a)))
    val disjointA = a.map(h => h % (P / 2))
    val disjointB = a.map(h => P / 2 + (h % (P / 2)))
    val (sa, sb) = (sig(disjointA), sig(disjointB))
    val agree = (0 until numHashes).count(k => sa(k) == sb(k))
    assert(agree <= numHashes / 8, s"disjoint sets agreed on $agree/$numHashes hashes")
  }
}
