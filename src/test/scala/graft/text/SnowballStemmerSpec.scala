package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Porter2 (Snowball English) stemmer — vectors hand-derived from the
  * published algorithm description (each traced through the region /
  * longest-suffix rules), plus the spec'd exceptional forms. */
class SnowballStemmerSpec extends AnyFunSuite {

  private def s(w: String) = SnowballStemmer.stem(w)

  test("exceptional forms and invariants") {
    assert(s("skis") == "ski"); assert(s("skies") == "sky")
    assert(s("dying") == "die"); assert(s("lying") == "lie")
    assert(s("tying") == "tie"); assert(s("idly") == "idl")
    assert(s("gently") == "gentl"); assert(s("ugly") == "ugli")
    assert(s("early") == "earli"); assert(s("only") == "onli")
    assert(s("singly") == "singl")
    assert(s("sky") == "sky"); assert(s("news") == "news")
    assert(s("atlas") == "atlas"); assert(s("cosmos") == "cosmos")
    assert(s("bias") == "bias"); assert(s("andes") == "andes")
    // post-1a invariants, reached via plural stripping too
    assert(s("proceed") == "proceed"); assert(s("exceed") == "exceed")
    assert(s("succeed") == "succeed"); assert(s("inning") == "inning")
    assert(s("herrings") == "herring")
  }

  test("step 1a plurals") {
    assert(s("caresses") == "caress")   // sses -> ss
    assert(s("ties") == "tie")          // ies, one preceding letter -> ie
    assert(s("dies") == "die")
    assert(s("cries") == "cri")         // ies, >1 preceding letter -> i
    assert(s("flies") == "fli")
    assert(s("gaps") == "gap")          // s with earlier vowel
    assert(s("kiwis") == "kiwi")
    assert(s("gas") == "gas")           // vowel only immediately before s
    assert(s("this") == "this")
    assert(s("senses") == "sens")       // + step-5 e drop
  }

  test("step 1b ed/ing with restoration rules") {
    assert(s("agreed") == "agre")       // eed in R1 -> ee; step-5 drops the e
                                        // (stem "agre" ends in a vowel, so no
                                        // short-syllable protection applies)
    assert(s("feed") == "feed")         // eed not in R1
    assert(s("argued") == "argu")
    assert(s("arguing") == "argu")
    assert(s("running") == "run")       // double nn undoubled
    assert(s("hopping") == "hop")
    assert(s("dropped") == "drop")
    assert(s("hoping") == "hope")       // short word -> restore e
    assert(s("hoped") == "hope")
    assert(s("fizzed") == "fizz")       // zz is NOT an undoublable double
    assert(s("possessed") == "possess")
    assert(s("conflated") == "conflat") // at -> ate restoration; step 5 then
                                        // deletes the e again (in R2)
    assert(s("troubled") == "troubl")   // bl -> ble; e re-dropped (R1, stem
                                        // not short-syllable-final)
    assert(s("sized") == "size")        // iz -> ize; e KEPT ("siz" ends a
                                        // short syllable)
  }

  test("step 1c consonant-y to i, with y-marking guards") {
    assert(s("happy") == "happi")
    assert(s("cry") == "cri")
    assert(s("by") == "by")             // preceding consonant is first letter
    assert(s("say") == "say")           // y after vowel (marked Y) untouched
    assert(s("crying") == "cri")
    assert(s("saying") == "say")
    assert(s("played") == "play")       // Y blocks short-syllable e-restore
    assert(s("enjoying") == "enjoy")
  }

  test("step 2 suffix mappings honour R1 and longest-match-stops") {
    assert(s("consistency") == "consist")    // enci -> ence, then step 4
    assert(s("radically") == "radic")        // alli -> al, then ical -> ic
    assert(s("quickly") == "quick")          // li after valid ending k
    assert(s("happily") == "happili")        // li after i: invalid ending
    assert(s("fluently") == "fluentli")      // entli matched but outside R1: stop
    assert(s("generously") == "generous")    // gener prefix R1, ousli -> ous
    assert(s("technology") == "technolog")   // ogi preceded by l
    assert(s("sensibilities") == "sensibl")  // ies -> i, biliti -> ble, e drop
    assert(s("rational") == "ration")        // ational outside R1 stops step 2/3;
                                             // step 4 al in R2
  }

  test("steps 3 and 4 strip derivational suffixes in-region") {
    assert(s("communication") == "communic") // commun prefix; ation->ate; icate->ic
    assert(s("conditional") == "condit")     // tional -> tion; ion after t in R2
    assert(s("national") == "nation")        // step-2/3 blocked; al in R2
    assert(s("electricity") == "electr")     // iciti -> ic -> dropped in R2
    assert(s("electrical") == "electr")
    assert(s("hopeful") == "hope")           // ful dropped; e kept (short syllable)
    assert(s("beautiful") == "beauti")
    assert(s("replacement") == "replac")     // ement in R2
    assert(s("agreement") == "agreement")    // ement outside R2
    assert(s("enjoyment") == "enjoy")
    assert(s("rationalize") == "ration")     // alize -> al, then al in R2
    assert(s("arsenal") == "arsenal")        // arsen prefix keeps al out of R2
  }

  test("step 5 e/l deletion") {
    assert(s("cease") == "ceas")
    assert(s("controll") == "control")       // ll in R2
    assert(s("roll") == "roll")              // ll outside R2
  }

  test("short tokens and non-letter input pass through") {
    assert(s("a") == "a"); assert(s("at") == "at"); assert(s("be") == "be")
    assert(s("42") == "42")
  }

  test("differs from classic Porter exactly where the algorithms differ") {
    // Porter2's li-deletion has no classic-Porter counterpart
    assert(SnowballStemmer.stem("quickly") == "quick")
    assert(PorterStemmer.stem("quickly") != "quick")
  }
}
