package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Porter stemmer to the vocabulary examples published in the 1980
  * paper (the step-rule examples), plus edge cases. */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "radicalli" -> "radic",
    "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("paper vocabulary examples stem correctly") {
    val wrong = vectors.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(wrong.isEmpty, s"\n${wrong.mkString("\n")}")
  }

  test("short words and degenerate input pass through") {
    assert(PorterStemmer.stem("a") == "a")
    assert(PorterStemmer.stem("is") == "is")
    assert(PorterStemmer.stem("ss") == "ss")
    assert(PorterStemmer.stem("the") == "the")
  }

  test("idempotent on already-stemmed common words") {
    for (w <- Seq("run", "cat", "gener", "troubl", "oper"))
      assert(PorterStemmer.stem(w) == w, w)
  }

  test("column expression matches the pure function") {
    val spark = graft.GraftSession.local(2)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val words = vectors.map(_._1)
    val got = words.toDF("w")
      .select(TextOps.porterStem(col("w")).as("s"))
      .as[String].collect().toSeq
    assert(got == words.map(PorterStemmer.stem))
  }
}
