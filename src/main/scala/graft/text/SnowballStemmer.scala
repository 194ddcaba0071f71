package graft.text

/** English (Porter2) "Snowball" stemmer — clean-room implementation from the
  * published algorithm description (M.F. Porter, snowballstem.org, "The
  * English (Porter2) stemming algorithm").
  *
  * This is the algorithm the reference's optional stemming stage actually ran
  * (reference feature/Utils.scala:200-204 loaded the external spark-stemming
  * Snowball jar): token-level parity with the reference requires Porter2, not
  * the classic 1980 Porter that [[PorterStemmer]] implements — the two differ
  * in a handful of suffix rules (e.g. Porter2's `li`-deletion, `ogi`→`og`,
  * exceptional forms, and the short-syllable `e` restoration).
  *
  * Pure function over lowercase words (the pipeline's clean stage lowercases);
  * internal uppercase `Y` marks consonant-y and is restored on exit.
  */
object SnowballStemmer {

  /** Exceptional stems and invariant words checked before any rule. */
  private val exceptional: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Words left invariant immediately after step 1a. */
  private val invariantAfter1a = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  // vowels are aeiou + lowercase y; marked consonant-y is 'Y' (not a vowel)
  private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private def endsDouble(w: String): Boolean =
    w.length >= 2 && doubles.contains(w.substring(w.length - 2))

  private val liEnding = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  /** Region start after the first non-vowel that follows a vowel, scanning
    * from `from`; `w.length` if no such position. */
  private def regionAfterVC(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isV(w.charAt(i))) i += 1
    while (i < w.length && isV(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** R1, with the gener/commun/arsen prefix special case. */
  private def r1of(w: String): Int = {
    if (w.startsWith("gener") || w.startsWith("arsen")) 5
    else if (w.startsWith("commun")) 6
    else regionAfterVC(w, 0)
  }

  /** Word ends in a short syllable: non-vowel + vowel + non-vowel(≠ w,x,Y),
    * or the whole word is vowel + non-vowel. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isV(w.charAt(0)) && !isV(w.charAt(1))
    else if (n >= 3) {
      val last = w.charAt(n - 1)
      !isV(w.charAt(n - 3)) && isV(w.charAt(n - 2)) && !isV(last) &&
        last != 'w' && last != 'x' && last != 'Y'
    } else false
  }

  private def isShortWord(w: String): Boolean =
    r1of(w) >= w.length && endsShortSyllable(w)

  /** suffix begins at or after region start */
  private def in(w: String, sufLen: Int, region: Int): Boolean =
    w.length - sufLen >= region

  def stem(word: String): String = {
    if (word.length <= 2) return word
    exceptional.get(word) match {
      case Some(s) => return s
      case None =>
    }
    var w = word
    // step 0: apostrophe trimming
    if (w.startsWith("'")) w = w.substring(1)
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)
    if (w.length <= 2) return w

    // mark consonant y (word-initial, or following a vowel) as Y
    val m = w.toCharArray
    if (m(0) == 'y') m(0) = 'Y'
    var i = 1
    while (i < m.length) {
      if (m(i) == 'y' && isV(m(i - 1))) m(i) = 'Y'
      i += 1
    }
    w = new String(m)

    // ---- step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s")) {
      // delete if the part before the s contains a vowel NOT immediately
      // before the s
      val head = w.substring(0, w.length - 2)
      if (head.exists(isV)) w = w.dropRight(1)
    }
    if (invariantAfter1a.contains(w)) return w

    // ---- step 1b (longest suffix wins; a failed condition stops the step)
    val r1a = r1of(w)
    if (w.endsWith("eedly")) {
      if (in(w, 5, r1a)) w = w.dropRight(3)
    } else if (w.endsWith("eed")) {
      if (in(w, 3, r1a)) w = w.dropRight(1)
    } else {
      val suf = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suf.foreach { s =>
        val head = w.dropRight(s.length)
        if (head.exists(isV)) {
          w = head
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (endsDouble(w)) w = w.dropRight(1)
          else if (isShortWord(w)) w += "e"
        }
      }
    }

    // ---- step 1c: y/Y → i after a non-vowel that is not the first letter
    if (w.length > 2) {
      val last = w.charAt(w.length - 1)
      if ((last == 'y' || last == 'Y') && !isV(w.charAt(w.length - 2)))
        w = w.dropRight(1) + "i"
    }

    // ---- step 2 (longest suffix; applies only in R1)
    val r1b = r1of(w)
    val step2: Seq[(String, String => String)] = Seq(
      "ational" -> ((s: String) => s.dropRight(7) + "ate"),
      "ization" -> ((s: String) => s.dropRight(7) + "ize"),
      "fulness" -> ((s: String) => s.dropRight(4)),
      "ousness" -> ((s: String) => s.dropRight(4)),
      "iveness" -> ((s: String) => s.dropRight(4)),
      "tional"  -> ((s: String) => s.dropRight(2)),
      "biliti"  -> ((s: String) => s.dropRight(6) + "ble"),
      "lessli"  -> ((s: String) => s.dropRight(2)),
      "entli"   -> ((s: String) => s.dropRight(2)),
      "ation"   -> ((s: String) => s.dropRight(5) + "ate"),
      "alism"   -> ((s: String) => s.dropRight(3)),
      "aliti"   -> ((s: String) => s.dropRight(3)),
      "ousli"   -> ((s: String) => s.dropRight(2)),
      "iviti"   -> ((s: String) => s.dropRight(5) + "ive"),
      "fulli"   -> ((s: String) => s.dropRight(2)),
      "enci"    -> ((s: String) => s.dropRight(4) + "ence"),
      "anci"    -> ((s: String) => s.dropRight(4) + "ance"),
      "abli"    -> ((s: String) => s.dropRight(4) + "able"),
      "izer"    -> ((s: String) => s.dropRight(1)),
      "ator"    -> ((s: String) => s.dropRight(2) + "e"),
      "alli"    -> ((s: String) => s.dropRight(2)),
      "ogi"     -> ((s: String) => s.dropRight(1)),
      "bli"     -> ((s: String) => s.dropRight(1) + "e"),
      "li"      -> ((s: String) => s.dropRight(2)))
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, fn) =>
      if (in(w, suf.length, r1b)) {
        suf match {
          case "ogi" =>
            if (w.length > 3 && w.charAt(w.length - 4) == 'l') w = fn(w)
          case "li" =>
            if (w.length > 2 && liEnding.contains(w.charAt(w.length - 3))) w = fn(w)
          case _ => w = fn(w)
        }
      }
    }

    // ---- step 3 (longest suffix; in R1; `ative` additionally needs R2)
    val r1c = r1of(w)
    val r2c = regionAfterVC(w, r1c)
    val step3: Seq[(String, String => String)] = Seq(
      "ational" -> ((s: String) => s.dropRight(7) + "ate"),
      "tional"  -> ((s: String) => s.dropRight(2)),
      "alize"   -> ((s: String) => s.dropRight(3)),
      "icate"   -> ((s: String) => s.dropRight(3)),
      "iciti"   -> ((s: String) => s.dropRight(5) + "ic"),
      "ative"   -> ((s: String) => s.dropRight(5)),
      "ical"    -> ((s: String) => s.dropRight(2)),
      "ness"    -> ((s: String) => s.dropRight(4)),
      "ful"     -> ((s: String) => s.dropRight(3)))
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, fn) =>
      if (in(w, suf.length, r1c)) {
        if (suf == "ative") { if (in(w, 5, r2c)) w = fn(w) }
        else w = fn(w)
      }
    }

    // ---- step 4 (longest suffix; in R2; `ion` needs preceding s/t)
    val r2d = regionAfterVC(w, r1of(w))
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(w.endsWith).foreach { suf =>
      if (in(w, suf.length, r2d)) {
        if (suf == "ion") {
          val p = w.charAt(w.length - 4)
          if (p == 's' || p == 't') w = w.dropRight(3)
        } else w = w.dropRight(suf.length)
      }
    }

    // ---- step 5
    val r1e = r1of(w)
    val r2e = regionAfterVC(w, r1e)
    if (w.endsWith("e")) {
      if (in(w, 1, r2e) ||
          (in(w, 1, r1e) && !endsShortSyllable(w.dropRight(1))))
        w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (in(w, 1, r2e) && w.length >= 2 && w.charAt(w.length - 2) == 'l')
        w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
