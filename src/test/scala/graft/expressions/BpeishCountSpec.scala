package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** BpeishCount (native single-scan token estimator) must match
  * regexp_count(s, '[A-Za-z0-9]+|[^A-Za-z0-9\s]') — the pattern it replaces
  * — on random strings including whitespace variants, punctuation runs and
  * non-ASCII, in both the codegen and interpreted eval paths.
  */
class BpeishCountSpec extends SparkSpec {
  import spark.implicits._

  private val pattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

  private def nativeForm(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.bridge.column(
      BpeishCount(org.apache.spark.sql.graft.bridge.expression(c)))

  test("matches regexp_count on random strings (codegen path)") {
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (3, Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')),
      (3, Gen.oneOf('.', ',', '!', '-', '_', '(', ')')),
      (1, Gen.oneOf('é', 'ß', '中')))
    val strGen = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, charGen))
    val corpus = (1 to 400).map(i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    val df = (corpus ++ Seq("", " ", "a", "a b", "a.b", "..", "a1b2 c3",
        "tab\there", "é é", "xy")).toDF("s")
      .select(col("s"),
        regexp_count(col("s"), lit(pattern)).as("a"),
        nativeForm(col("s")).as("b"))
    val bad = df.filter(col("a") =!= col("b")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("space-only variant matches its regex on random strings") {
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (3, Gen.oneOf(' ', '\t', '\n')),
      (3, Gen.oneOf('.', ',', '!', '-')))
    val strGen = Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, charGen))
    val corpus = (1 to 300).map(i =>
      strGen.apply(Gen.Parameters.default, Seed(1000L + i)).get)
    val df = (corpus ++ Seq("a\tb", "x\ny", " .\t")).toDF("s")
      .select(
        regexp_count(col("s"), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]")).as("a"),
        org.apache.spark.sql.graft.bridge.column(
          BpeishCount(org.apache.spark.sql.graft.bridge.expression(col("s")),
            spaceOnlyWs = true)).as("b"))
    val bad = df.filter(col("a") =!= col("b")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("interpreted eval agrees and nulls propagate") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    // matches: "a" "." "b" "c" "!" "!" = 6
    assert(BpeishCount(Literal("a.b c!!")).eval(null) == 6)
    assert(BpeishCount(Literal(null, StringType)).eval(null) == null)
  }
}
