package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized equivalence of the scale-shaped join rewrites against their
  * naive definitions: binned range/overlap joins vs a driver-side theta scan,
  * as-of join vs per-row latest-prior search. Deterministic scalacheck
  * sampling (fixed seed); odd bin widths stress bin-boundary handling.
  */
class JoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // timestamps on a coarse grid with deliberate collisions
  private val tsGen: Gen[Long] = Gen.choose(0L, 500L).map(_ * 60000L)

  test("pointInInterval equals the naive theta join on random data") {
    val ptsGen = Gen.listOfN(120, tsGen)
    val ivGen = Gen.listOfN(40, Gen.zip(tsGen, Gen.choose(1L, 180L)))
    for (seed <- 1L to 3L) {
      val pts = sample(ptsGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val ivs = sample(ivGen, seed + 100).zipWithIndex
        .map { case ((s, mins), i) => (i.toLong, s, s + mins * 60000L) }
      val naive = (for {
        (pid, pt) <- pts
        (iid, s, e) <- ivs
        if pt >= s && pt < e
      } yield (pid, iid)).toSet
      val pDf = pts.map { case (id, t) => (id, new Timestamp(t)) }
        .toDF("p_id", "ts")
      val iDf = ivs.map { case (id, s, e) =>
        (id, new Timestamp(s), new Timestamp(e))
      }.toDF("i_id", "s", "e")
      for (bin <- Seq(60L, 3600L, 7200L)) {
        val got = RangeJoin.pointInInterval(pDf, iDf, "ts", "s", "e", bin)
          .select("p_id", "i_id").as[(Long, Long)].collect()
        assert(got.length == got.toSet.size, s"dup pairs seed=$seed bin=$bin")
        assert(got.toSet == naive, s"mismatch seed=$seed bin=$bin")
      }
    }
  }

  test("intervalOverlap equals the naive theta join on random data") {
    val ivGen = Gen.listOfN(60, Gen.zip(tsGen, Gen.choose(1L, 240L)))
    for (seed <- 1L to 3L) {
      val ls = sample(ivGen, seed).zipWithIndex
        .map { case ((s, m), i) => (i.toLong, s, s + m * 60000L) }
      val rs = sample(ivGen, seed + 50).zipWithIndex
        .map { case ((s, m), i) => (i.toLong, s, s + m * 60000L) }
      val naive = (for {
        (lid, lsr, le) <- ls
        (rid, rsr, re) <- rs
        if lsr < re && rsr < le
      } yield (lid, rid)).toSet
      val lDf = ls.map { case (id, s, e) =>
        (id, new Timestamp(s), new Timestamp(e))
      }.toDF("l_id", "ls", "le")
      val rDf = rs.map { case (id, s, e) =>
        (id, new Timestamp(s), new Timestamp(e))
      }.toDF("r_id", "rs", "re")
      for (bin <- Seq(60L, 3600L, 86400L)) {
        val got = RangeJoin.intervalOverlap(lDf, rDf, "ls", "le", "rs", "re", bin)
          .select("l_id", "r_id").as[(Long, Long)].collect()
        assert(got.length == got.toSet.size, s"dup pairs seed=$seed bin=$bin")
        assert(got.toSet == naive, s"mismatch seed=$seed bin=$bin")
      }
    }
  }

  test("leftAsOf equals the naive latest-prior search on random data") {
    val leftGen = Gen.listOfN(150, Gen.zip(Gen.choose(0L, 20L), tsGen))
    val rightGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 20L), tsGen, Gen.choose(0.0, 100.0)))
    for (seed <- 1L to 3L) {
      val lefts = sample(leftGen, seed).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
      // one right row per (key, ts): leftAsOf's documented precondition
      val rights = sample(rightGen, seed + 7)
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val naive = lefts.map { case (id, k, t) =>
        val prior = rights.filter(r => r._1 == k && r._2 <= t)
        id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
      }.toMap
      val lDf = lefts.map { case (id, k, t) => (id, k, new Timestamp(t)) }
        .toDF("id", "k", "ts")
      val rDf = rights.map { case (k, t, v) => (k, new Timestamp(t), v) }
        .toDF("k", "ts", "v")
      val got = AsOfJoin.leftAsOf(lDf, rDf, "k", "ts", Seq("v"))
        .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
      assert(got == naive, s"mismatch seed=$seed")
    }
  }
}
