package graft.analyzer

/** Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 — public algorithm; groonga ships the Snowball
  * variant as a token filter, /root/reference/plugins/token_filters/stem.c).
  * Operates on lowercase ASCII words; non-alpha inputs pass through.
  */
object PorterStemmer {

  private def isVowelAt(w: CharSequence, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** measure m of w[0..end): number of VC sequences */
  private def measure(w: CharSequence, end: Int): Int = {
    var m = 0
    var i = 0
    // skip initial consonants
    while (i < end && !isVowelAt(w, i)) i += 1
    while (i < end) {
      while (i < end && isVowelAt(w, i)) i += 1
      if (i < end) { m += 1; while (i < end && !isVowelAt(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: CharSequence, end: Int): Boolean = {
    var i = 0
    while (i < end) { if (isVowelAt(w, i)) return true; i += 1 }
    false
  }

  private def doubleConsonant(w: CharSequence, end: Int): Boolean =
    end >= 2 && w.charAt(end - 1) == w.charAt(end - 2) && !isVowelAt(w, end - 1)

  /** *o: cvc where the final c is not w, x or y */
  private def cvc(w: CharSequence, end: Int): Boolean = {
    if (end < 3) return false
    val c = w.charAt(end - 1)
    !isVowelAt(w, end - 1) && isVowelAt(w, end - 2) && !isVowelAt(w, end - 3) &&
      c != 'w' && c != 'x' && c != 'y'
  }

  def stem(word: String): String = {
    if (word.length <= 2 || !word.forall(c => c >= 'a' && c <= 'z')) return word
    val b = new StringBuilder(word)

    def endsWith(s: String): Boolean =
      b.length >= s.length && b.substring(b.length - s.length) == s
    def stemLen(suffix: String): Int = b.length - suffix.length
    def m(suffix: String): Int = measure(b, stemLen(suffix))
    def replace(suffix: String, to: String): Unit = {
      b.setLength(b.length - suffix.length); b.append(to)
    }

    // Step 1a
    if (endsWith("sses")) replace("sses", "ss")
    else if (endsWith("ies")) replace("ies", "i")
    else if (endsWith("ss")) ()
    else if (endsWith("s")) replace("s", "")

    // Step 1b
    var extraStep1b = false
    if (endsWith("eed")) {
      if (m("eed") > 0) replace("eed", "ee")
    } else if (endsWith("ed") && containsVowel(b, stemLen("ed"))) {
      replace("ed", ""); extraStep1b = true
    } else if (endsWith("ing") && containsVowel(b, stemLen("ing"))) {
      replace("ing", ""); extraStep1b = true
    }
    if (extraStep1b) {
      if (endsWith("at")) replace("at", "ate")
      else if (endsWith("bl")) replace("bl", "ble")
      else if (endsWith("iz")) replace("iz", "ize")
      else if (doubleConsonant(b, b.length)) {
        val last = b.charAt(b.length - 1)
        if (last != 'l' && last != 's' && last != 'z') b.setLength(b.length - 1)
      } else if (measure(b, b.length) == 1 && cvc(b, b.length)) b.append('e')
    }

    // Step 1c
    if (endsWith("y") && containsVowel(b, stemLen("y"))) replace("y", "i")

    // Step 2 (longest match among same-final-letter rules; list order works
    // because no rule's pattern is a suffix of another here)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.find { case (suf, _) => endsWith(suf) }.foreach { case (suf, to) =>
      if (m(suf) > 0) replace(suf, to)
    }

    // Step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => endsWith(suf) }.foreach { case (suf, to) =>
      if (m(suf) > 0) replace(suf, to)
    }

    // Step 4 — "ement" before "ment" before "ent" (longest match)
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
      "ive", "ize")
    step4.filter(endsWith).sortBy(-_.length).headOption.foreach { suf =>
      val ok =
        if (suf == "ion") {
          val sl = stemLen(suf)
          m(suf) > 1 && sl > 0 && (b.charAt(sl - 1) == 's' || b.charAt(sl - 1) == 't')
        } else m(suf) > 1
      if (ok) replace(suf, "")
    }

    // Step 5a
    if (endsWith("e")) {
      val mm = m("e")
      if (mm > 1 || (mm == 1 && !cvc(b, stemLen("e")))) replace("e", "")
    }
    // Step 5b
    if (measure(b, b.length) > 1 && doubleConsonant(b, b.length) &&
        b.charAt(b.length - 1) == 'l')
      b.setLength(b.length - 1)

    b.toString
  }
}

/** Harman S-stemmer ("How effective is suffixing?", JASIS 42(1), 1991):
  * three plural-stripping rules, deliberately simple enough to replicate
  * exactly in plain SQL (the correctness-gate oracle mirrors it). */
object SStemmer {
  /** rules are tried longest-suffix-first and their exceptions are
    * TERMINAL (an 'oes' word is left alone, it does not fall through to
    * the bare-'s' rule) — the formulation in Harman's paper */
  def stem(w: String): String = {
    if (w.endsWith("ies"))
      if (w.length >= 4 && !w.endsWith("eies") && !w.endsWith("aies"))
        w.dropRight(3) + "y"
      else w
    else if (w.endsWith("es"))
      if (w.length >= 4 && !w.endsWith("aes") && !w.endsWith("ees") && !w.endsWith("oes"))
        w.dropRight(1)
      else w
    else if (w.endsWith("s"))
      if (w.length >= 3 && !w.endsWith("us") && !w.endsWith("ss")) w.dropRight(1)
      else w
    else w
  }
}
