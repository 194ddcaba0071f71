package graft.text

/** Classic Porter stemmer — M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3) 1980. Clean-room implementation from the published algorithm.
  *
  * Fills the reference's optional stemming stage (reference
  * feature/Utils.scala:200-204 used the external spark-stemming Snowball jar,
  * absent offline). The original Porter algorithm differs from Snowball
  * "english" in a handful of suffix rules; specs pin this implementation to
  * the vocabulary examples published in the 1980 paper.
  *
  * Pure function over lowercase ASCII words; non-letter input is returned
  * unchanged by the caller's tokenization contract (tokens are already
  * lowercased by the clean stage).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    val w = new java.lang.StringBuilder(word)
    step1a(w); step1b(w); step1c(w); step2(w); step3(w); step4(w); step5(w)
    w.toString
  }

  /** True if w(i) is a consonant: not aeiou; y is a consonant iff it follows
    * a vowel or starts the word. */
  private def isCons(w: java.lang.StringBuilder, i: Int): Boolean =
    w.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !isCons(w, i - 1)
      case _ => true
    }

  /** m = number of VC sequences in w[0..end] (end inclusive). */
  private def measure(w: java.lang.StringBuilder, end: Int): Int = {
    var m = 0
    var i = 0
    while (i <= end && isCons(w, i)) i += 1
    while (i <= end) {
      while (i <= end && !isCons(w, i)) i += 1
      if (i <= end) {
        m += 1
        while (i <= end && isCons(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: java.lang.StringBuilder, end: Int): Boolean = {
    var i = 0
    while (i <= end) { if (!isCons(w, i)) return true; i += 1 }
    false
  }

  /** Index of the last stem char if w ends with suffix, else -1. */
  private def ends(w: java.lang.StringBuilder, s: String): Int = {
    val n = w.length - s.length
    if (n < 0) return -1
    var i = 0
    while (i < s.length) {
      if (w.charAt(n + i) != s.charAt(i)) return -1
      i += 1
    }
    n - 1
  }

  /** Ends in double consonant (same letter twice, consonant). */
  private def doubleCons(w: java.lang.StringBuilder): Boolean = {
    val n = w.length - 1
    n >= 1 && w.charAt(n) == w.charAt(n - 1) && isCons(w, n)
  }

  /** w[0..i] ends consonant-vowel-consonant where the final consonant is not
    * w, x or y (the *o condition of the paper). */
  private def cvc(w: java.lang.StringBuilder, i: Int): Boolean =
    i >= 2 && isCons(w, i) && !isCons(w, i - 1) && isCons(w, i - 2) &&
      (w.charAt(i) match { case 'w' | 'x' | 'y' => false; case _ => true })

  private def setTo(w: java.lang.StringBuilder, stemEnd: Int, s: String): Unit = {
    w.setLength(stemEnd + 1)
    w.append(s)
  }

  private def endsStr(w: java.lang.StringBuilder, s: String): Boolean = {
    val n = w.length - s.length
    if (n < 0) return false
    var i = 0
    while (i < s.length) {
      if (w.charAt(n + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** SSES->SS, IES->I, SS->SS, S->"". */
  private def step1a(w: java.lang.StringBuilder): Unit = {
    if (w.charAt(w.length - 1) == 's') {
      if (endsStr(w, "sses")) w.setLength(w.length - 2)
      else if (endsStr(w, "ies")) w.setLength(w.length - 2)
      else if (endsStr(w, "ss")) ()
      else w.setLength(w.length - 1)
    }
  }

  /** (m>0) EED->EE; (*v*) ED->"", (*v*) ING->"" with cleanup rules. */
  private def step1b(w: java.lang.StringBuilder): Unit = {
    if (endsStr(w, "eed")) {
      if (measure(w, ends(w, "eed")) > 0) w.setLength(w.length - 1)
      return
    }
    var fired = false
    if (endsStr(w, "ed")) {
      val j = ends(w, "ed")
      if (j >= 0 && hasVowel(w, j)) { w.setLength(j + 1); fired = true } else return
    } else if (endsStr(w, "ing")) {
      val j = ends(w, "ing")
      if (j >= 0 && hasVowel(w, j)) { w.setLength(j + 1); fired = true } else return
    }
    if (fired) {
      if (endsStr(w, "at") || endsStr(w, "bl") || endsStr(w, "iz")) w.append('e')
      else if (doubleCons(w)) {
        val c = w.charAt(w.length - 1)
        if (c != 'l' && c != 's' && c != 'z') w.setLength(w.length - 1)
      } else if (measure(w, w.length - 1) == 1 && cvc(w, w.length - 1)) w.append('e')
    }
  }

  private def step1c(w: java.lang.StringBuilder): Unit = {
    if (w.charAt(w.length - 1) == 'y' && hasVowel(w, w.length - 2))
      w.setCharAt(w.length - 1, 'i')
  }

  private val step2Rules: Array[(String, String)] = Array(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Rules: Array[(String, String)] = Array(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes: Array[String] = Array(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def applyRules(w: java.lang.StringBuilder,
                         rules: Array[(String, String)]): Unit = {
    var i = 0
    while (i < rules.length) {
      val (suf, rep) = rules(i)
      val j = ends(w, suf)
      if (endsStr(w, suf)) {
        if (measure(w, j) > 0) setTo(w, j, rep)
        return
      }
      i += 1
    }
  }

  private def step2(w: java.lang.StringBuilder): Unit = applyRules(w, step2Rules)

  private def step3(w: java.lang.StringBuilder): Unit = applyRules(w, step3Rules)

  private def step4(w: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < step4Suffixes.length) {
      val suf = step4Suffixes(i)
      if (endsStr(w, suf)) {
        val j = ends(w, suf)
        if (measure(w, j) > 1 &&
            (suf != "ion" || (j >= 0 && (w.charAt(j) == 's' || w.charAt(j) == 't'))))
          w.setLength(j + 1)
        return
      }
      i += 1
    }
  }

  private def step5(w: java.lang.StringBuilder): Unit = {
    // 5a
    if (w.length > 0 && w.charAt(w.length - 1) == 'e') {
      val m = measure(w, w.length - 2)
      if (m > 1 || (m == 1 && !cvc(w, w.length - 2))) w.setLength(w.length - 1)
    }
    // 5b
    if (w.length > 1 && w.charAt(w.length - 1) == 'l' && doubleCons(w) &&
        measure(w, w.length - 2) > 1)
      w.setLength(w.length - 1)
  }
}
