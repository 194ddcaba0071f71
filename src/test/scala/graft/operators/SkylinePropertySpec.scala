package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins the skyline sweep rewrite to the O(n²) dominance definition on random
  * inputs — including duplicate points and ties on either dimension, the
  * cases where a sweep formulation typically drifts from the spec.
  */
class SkylinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def brute(pts: Seq[(Long, Double, Int)]): Set[Long] =
    pts.filter { case (_, p, s) =>
      !pts.exists { case (_, q, t) =>
        q <= p && t >= s && (q < p || t > s)
      }
    }.map(_._1).toSet

  test("pareto2d == brute-force dominance on random point sets (with ties)") {
    // small value domains force duplicate prices/sizes and exact-tie points
    val ptGen = Gen.zip(Gen.choose(1, 8).map(_.toDouble), Gen.choose(1, 8))
    for (seed <- 1L to 8L) {
      val pts = sample(Gen.listOfN(60, ptGen), seed).zipWithIndex
        .map { case ((p, s), i) => (i.toLong, p, s) }
      val df = pts.toDF("id", "price", "size")
      val got = Skyline.pareto2d(df, "price", "size")
        .select("id").as[Long].collect().toSet
      assert(got == brute(pts), s"seed=$seed: got $got expected ${brute(pts)}")
    }
  }

  test("pareto2d on degenerate inputs: empty, single row, all-identical") {
    assert(Skyline.pareto2d(
      Seq.empty[(Long, Double, Int)].toDF("id", "price", "size"),
      "price", "size").count() == 0)
    assert(Skyline.pareto2d(
      Seq((1L, 5.0, 5)).toDF("id", "price", "size"),
      "price", "size").count() == 1)
    // identical points: none strictly dominates another — ALL survive
    assert(Skyline.pareto2d(
      Seq((1L, 2.0, 3), (2L, 2.0, 3), (3L, 2.0, 3)).toDF("id", "price", "size"),
      "price", "size").count() == 3)
  }
}
