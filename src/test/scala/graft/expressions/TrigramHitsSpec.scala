package graft.expressions

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** TrigramHits (native single-scan trigram counter) must be bit-identical to
  * the Column formulation it replaces — size(filter(charTrigrams(s),
  * isin(profile))) — on random strings, in BOTH the codegen and interpreted
  * eval paths.
  */
class TrigramHitsSpec extends SparkSpec {
  import spark.implicits._

  private val profile = TextOps.langTrigramProfiles("en")

  private def arrayForm(c: org.apache.spark.sql.Column) =
    size(filter(TextOps.charTrigrams(lower(c)),
      t => t.isin(profile.map(lit): _*)))

  private def nativeForm(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.bridge.column(
      TrigramHits(org.apache.spark.sql.graft.bridge.expression(lower(c)), profile))

  test("matches the array formulation on random strings (codegen path)") {
    val charGen = Gen.frequency(
      (5, Gen.oneOf('t', 'h', 'e', 'i', 'n', 'g', ' ')),
      (2, Gen.alphaLowerChar), (1, Gen.const('é')))
    val strGen = Gen.chooseNum(0, 40).flatMap(n => Gen.stringOfN(n, charGen))
    // deterministic corpus: 300 seeded samples
    val corpus = (1 to 300).map(i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    val df = (corpus ++ Seq("", "th", "the", "ththe", "the thing")).toDF("s")
      .select(col("s"), arrayForm(col("s")).as("a"), nativeForm(col("s")).as("b"))
    val bad = df.filter(col("a") =!= col("b")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("null-safe and interpreted eval agrees") {
    val df = Seq(Some("the thing"), None, Some("és th")).toDF("s")
      .select(nativeForm(col("s")).as("n"))
    assert(df.collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
      == Seq(4, -1, 1))
    // direct interpreted eval (no codegen)
    val e = TrigramHits(
      org.apache.spark.sql.catalyst.expressions.Literal("the thing"), profile)
    assert(e.eval(null) == 4)
  }
}
