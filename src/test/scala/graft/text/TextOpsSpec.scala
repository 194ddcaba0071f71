package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Column-expression text operators (SURVEY F1-F5, M1/M4 + extensions). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Row =
    Seq(text).toDF("t").select(colExpr.as("v")).head()

  test("clean strips digits and clutter punctuation, lowercases") {
    assert(one(TextOps.clean(col("t")), "Ab1,c:d;e?f!g2") == Row("abcdefg"))
  }

  test("dropSmallWords removes 1-2 letter words") {
    assert(one(TextOps.dropSmallWords(col("t")), "an apple is it tasty")
      == Row(" apple   tasty"))
  }

  test("tokens splits on space and drops empties") {
    assert(one(TextOps.tokens(col("t")), "  a  bb  ccc ")
      == Row(Seq("a", "bb", "ccc")))
  }

  test("ngrams produces sliding windows; short inputs give empty array") {
    assert(one(TextOps.ngrams(TextOps.tokens(col("t")), 2), "a b c")
      == Row(Seq("a b", "b c")))
    assert(one(TextOps.ngrams(TextOps.tokens(col("t")), 5), "a b c")
      == Row(Seq.empty[String]))
  }

  test("ngrams matches ml.feature.NGram semantics") {
    import org.apache.spark.ml.feature.NGram
    val df = Seq(Seq("a", "b", "c", "d")).toDF("toks")
    val expected = new NGram().setN(3).setInputCol("toks").setOutputCol("out")
      .transform(df).select("out").head().getSeq[String](0)
    val got = df.select(TextOps.ngrams(col("toks"), 3).as("out"))
      .head().getSeq[String](0)
    assert(got == expected)
  }

  test("langId picks dominant marker language; und for no markers") {
    assert(one(TextOps.langId(col("t")), "the cat of the house is big") == Row("en"))
    assert(one(TextOps.langId(col("t")), "el perro de la casa y que") == Row("es"))
    assert(one(TextOps.langId(col("t")), "der hund und die katze ist nicht") == Row("de"))
    assert(one(TextOps.langId(col("t")), "les chats et une maison est") == Row("fr"))
    assert(one(TextOps.langId(col("t")), "xyzzy plugh") == Row("und"))
  }

  test("langIdNgram: trigram-profile heuristic; short/empty input is und") {
    assert(one(TextOps.langIdNgram(col("t")), "the thing and the other thing") == Row("en"))
    assert(one(TextOps.langIdNgram(col("t")), "der hund und die katze ist") == Row("de"))
    assert(one(TextOps.langIdNgram(col("t")), "ab") == Row("und"))
    assert(one(TextOps.langIdNgram(col("t")), "") == Row("und"))
    val tg = one(TextOps.charTrigrams(col("t")), "abcd").getSeq[String](0)
    assert(tg == Seq("abc", "bcd"))
  }

  test("tokenCount and bpeishCount") {
    assert(one(TextOps.tokenCount(col("t")), "one two  three") == Row(3))
    // "don't stop" → don + t + stop word pieces + 1 apostrophe = 4
    assert(one(TextOps.bpeishCount(col("t")), "don't stop") == Row(4))
  }

  test("fingerprint is md5 hex of the text") {
    assert(one(TextOps.fingerprint(col("t")), "abc")
      == Row("900150983cd24fb0d6963f7d28e17f72"))
  }

  test("tokenChars sums token lengths") {
    assert(one(TextOps.tokenChars(TextOps.tokens(col("t"))), "ab cde") == Row(5))
  }
}
