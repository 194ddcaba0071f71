package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SplitNonEmpty must be bit-identical to filter(split(s, " "), len > 0) —
  * the form it replaces — on random strings with leading/trailing/repeated
  * spaces and multibyte characters, in both eval paths.
  */
class SplitNonEmptySpec extends SparkSpec {
  import spark.implicits._

  private def arrayForm(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), t => length(t) > 0)

  private def nativeForm(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.bridge.column(
      SplitNonEmpty(org.apache.spark.sql.graft.bridge.expression(c)))

  test("matches filter(split) on random strings (codegen path)") {
    val charGen = Gen.frequency(
      (5, Gen.alphaLowerChar), (3, Gen.const(' ')),
      (1, Gen.oneOf('é', '中', '!', '\t')))
    val strGen = Gen.chooseNum(0, 50).flatMap(n => Gen.stringOfN(n, charGen))
    val corpus = (1 to 400).map(i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    val df = (corpus ++ Seq("", " ", "  ", "a", " a ", "a  b", "é 中  x "))
      .toDF("s")
      .select(arrayForm(col("s")).as("a"), nativeForm(col("s")).as("b"))
    val bad = df.filter(not(col("a") <=> col("b"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("interpreted eval and null propagation") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val arr = SplitNonEmpty(Literal(" a  bc ")).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(arr.numElements() == 2 &&
      arr.getUTF8String(0).toString == "a" && arr.getUTF8String(1).toString == "bc")
    assert(SplitNonEmpty(Literal(null, StringType)).eval(null) == null)
  }
}
