package graft.similarity

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property tests for the nine similarity kernels (SURVEY §2.10).
  * Properties mirror the reference's documented semantics
  * (reference similarity/SimilarityMeasure.scala:19-175): range [0,100],
  * symmetry for the symmetric measures, jaccard==100 iff identical supports.
  * Property sampling uses scalacheck Gen with a FIXED seed (no scalatestplus
  * bridge offline) so runs are reproducible.
  */
class KernelsSpec extends AnyFunSuite {

  private val dim = 32

  private def sv(pairs: (Int, Double)*): Vector =
    Vectors.sparse(dim, pairs.map(_._1).toArray, pairs.map(_._2).toArray)

  private val genSparse: Gen[Vector] = for {
    n <- Gen.choose(1, dim)
    idx <- Gen.pick(n, 0 until dim)
    vals <- Gen.listOfN(n, Gen.choose(0.1, 5.0))
  } yield Vectors.sparse(dim, idx.toArray.sorted, vals.toArray)

  /** 200 deterministic samples of (x, y). */
  private val vectorPairs: Seq[(Vector, Vector)] =
    Gen.listOfN(200, Gen.zip(genSparse, genSparse))
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("gen failed"))

  test("cosine of identical vectors is 100") {
    val v = sv(1 -> 2.0, 5 -> 3.0)
    assert(math.abs(Kernels.cosine(v, v) - 100.0f) < 1e-4)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(Kernels.cosine(sv(0 -> 1.0), sv(1 -> 1.0)) == 0.0f)
  }

  test("cosine known value: 45 degrees") {
    // x=(1,0), y=(1,1) → cos = 1/√2 → 70.71...
    val got = Kernels.cosine(sv(0 -> 1.0), sv(0 -> 1.0, 1 -> 1.0))
    assert(math.abs(got - 70.71068f) < 1e-3)
  }

  test("manhattan: 100/(1+L1)") {
    // L1 = |1-0| + |0-3| = 4 → 20
    assert(math.abs(Kernels.manhattan(sv(0 -> 1.0), sv(1 -> 3.0)) - 20.0f) < 1e-4)
  }

  test("jaccard on disjoint supports is 0, identical supports 100") {
    assert(Kernels.jaccard(sv(0 -> 1.0), sv(1 -> 1.0)) == 0.0f)
    assert(Kernels.jaccard(sv(0 -> 1.0, 3 -> 2.0), sv(0 -> 9.0, 3 -> 1.0)) == 100.0f)
  }

  test("jaccard known value |∩|=1 |∪|=3") {
    val got = Kernels.jaccard(sv(0 -> 1.0, 1 -> 1.0), sv(1 -> 1.0, 2 -> 1.0))
    assert(math.abs(got - 100.0f / 3) < 1e-4)
  }

  test("left/right/maxasym jaccard asymmetry") {
    val x = sv(0 -> 1.0, 1 -> 1.0, 2 -> 1.0, 3 -> 1.0) // |x|=4
    val y = sv(0 -> 1.0, 1 -> 1.0)                     // |y|=2, ∩=2
    assert(Kernels.leftJaccard(x, y) == 50.0f)
    assert(Kernels.rightJaccard(x, y) == 100.0f)
    assert(Kernels.maxAsymJaccard(x, y) == 100.0f)
    assert(Kernels.leftJaccard(y, x) == 100.0f)
    assert(Kernels.rightJaccard(y, x) == 50.0f)
  }

  test("hamming: identical → 100; mismatches counted elementwise when dense-ish") {
    val x = sv((0 to 10).map(i => i -> 1.0): _*)
    assert(Kernels.hamming(x, x) == 100.0f)
    val y = sv(((0 to 9) :+ 11).map(i => i -> 1.0): _*)
    // positions 10 and 11 mismatch → 100/3
    assert(math.abs(Kernels.hamming(x, y) - 100.0f / 3) < 1e-4)
  }

  test("dense_jaccard counts matching positions") {
    val x = sv(0 -> 1.0, 1 -> 2.0)
    val y = sv(0 -> 1.0, 2 -> 3.0)
    // mismatches at 1 and 2 → (32-2)/32
    assert(math.abs(Kernels.denseJaccard(x, y) - 100.0f * 30 / 32) < 1e-4)
  }

  test("weighted_jaccard falls back to jaccard for balanced sizes") {
    val x = sv(0 -> 1.0, 1 -> 1.0)
    val y = sv(1 -> 1.0, 2 -> 1.0)
    assert(Kernels.weightedJaccard(x, y) == Kernels.jaccard(x, y))
  }

  test("property: all measures in [0,100], symmetric measures symmetric") {
    // hamming excluded: the reference branches on v1's nnz only
    // (SimilarityMeasure.scala:65), so it is asymmetric across the
    // sparse/dense boundary — mirrored faithfully here.
    val symmetric = Seq("cosine", "manhattan", "jaccard",
      "maxasymjaccard", "weighted_jaccard", "dense_jaccard")
    vectorPairs.foreach { case (x, y) =>
      Kernels.byName.foreach { case (name, m) =>
        val v = m(x, y)
        assert(v >= -1e-3f && v <= 100.0f + 1e-3f, s"$name out of range: $v")
      }
      symmetric.foreach { name =>
        val m = Kernels.byName(name)
        assert(math.abs(m(x, y) - m(y, x)) < 1e-3f, s"$name not symmetric")
      }
    }
  }

  test("property: jaccard == 100 iff supports identical") {
    vectorPairs.foreach { case (x, y) =>
      val same = x.toSparse.indices.sameElements(y.toSparse.indices)
      val j = Kernels.jaccard(x, y)
      assert((j == 100.0f) == same, s"jaccard=$j sameSupports=$same")
    }
  }

  test("intersectionSize merges sorted arrays") {
    assert(Kernels.intersectionSize(Array(1, 3, 5), Array(3, 5, 7)) == 2)
    assert(Kernels.intersectionSize(Array[Int](), Array(1)) == 0)
    assert(Kernels.intersectionSize(Array(2), Array(2)) == 1)
  }

  test("weighted_jaccard on indicator vectors equals the set-size formula " +
      "(the q_weighted_jaccard oracle), both branches") {
    // set A of size a, set B of size b, |A∩B| = i → 0/1 indicator vectors
    def indicator(idx: Seq[Int], dim: Int) =
      Vectors.sparse(dim, idx.map(j => (j, 1.0)))
    def setFormula(sa: Double, sb: Double, inter: Double): Double = {
      val rel = math.abs(sa - sb) / math.sqrt(sa * sb)
      if (rel > 5.0) {
        val alpha = math.min(sa, sb) / math.max(sa, sb)
        val r = inter / math.min(sa, sb)
        val w = (1.0 - r) * (1.0 + alpha) /
          ((1.0 + r) * (1.0 + alpha - 2.0 * alpha * r))
        val l1 = sa + sb - 2.0 * inter
        100.0 * (sa + sb - w * l1) / (sa + sb + w * l1)
      } else inter / (sa + sb - inter) * 100.0
    }
    // (|A|, |B|, |∩|): balanced → fallback; 1-vs-40 and 2-vs-80 → blend
    for ((a, b, i) <- Seq((10, 12, 6), (1, 40, 1), (1, 40, 0), (2, 80, 1))) {
      val dim = 100
      val va = indicator(0 until a, dim)
      val vb = indicator((a - i) until (a - i + b), dim)
      val got = Kernels.weightedJaccard(va, vb)
      val want = setFormula(a, b, i)
      assert(math.abs(got - want) < 1e-4,
        s"a=$a b=$b i=$i kernel=$got setFormula=$want")
    }
  }

  test("dot and l1Distance agree between sparse and dense representations") {
    vectorPairs.take(50).foreach { case (x, y) =>
      val (dx, dy) = (Vectors.dense(x.toArray), Vectors.dense(y.toArray))
      assert(math.abs(Kernels.dot(x, y) - Kernels.dot(dx, dy)) < 1e-9)
      assert(math.abs(Kernels.l1Distance(x, y) - Kernels.l1Distance(dx, dy)) < 1e-9)
    }
  }
}
