package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join / skew-spread distinct: result equivalence with the plain
  * forms, exactly-once pair semantics under duplicates, and the spread
  * property (a hot key occupies >1 salt bucket).
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 997 of 1000 left rows share key 1; right has multiplicity 2 on it
  private lazy val big = (1 to 1000)
    .map(i => (if (i <= 997) 1L else i.toLong, s"row$i"))
    .toDF("k", "payload")
  private lazy val small = Seq(
    (1L, "a"), (1L, "b"), (998L, "c"), (2L, "nomatch")
  ).toDF("k", "tag")

  test("salted join equals the plain join, duplicates included") {
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "tag").as[(Long, String, String)]
      .collect().sorted.toSeq
    val salted = SkewOps.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "payload", "tag").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(plain.nonEmpty && salted == plain)
    // hot key 1 matches both right rows: 997 * 2 pairs, each exactly once
    assert(salted.count(_._1 == 1L) == 997 * 2)
  }

  test("the hot key's rows actually spread across salt buckets") {
    val spread = big
      .withColumn("__salt",
        pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)))
      .filter($"k" === 1L)
      .select(countDistinct($"__salt")).as[Long].head()
    assert(spread > 4, s"hot key landed in only $spread of 8 salt buckets")
  }

  test("exactCountDistinct equals countDistinct") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L), ("b", 5L), ("c", 7L)
    ).toDF("g", "v")
    val got = SkewOps.exactCountDistinct(df, Seq("g"), "v")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }
}
