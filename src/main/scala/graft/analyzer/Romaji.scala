package graft.analyzer

/** Romaji → hiragana conversion for prefix_rk_search (Hepburn/kunrei
  * mappings are public knowledge; reference behavior:
  * /root/reference/lib/proc.c prefix_rk_search over a reading table).
  *
  * `candidates(prefix)` returns the hiragana strings a romaji PREFIX can
  * denote: full syllables are converted greedily; a trailing lone
  * consonant expands to every kana of its row (what makes "k" match
  * か..こ and きゃ..きょ).
  */
object Romaji {

  private val base: Map[String, String] = Map(
    "a" -> "あ", "i" -> "い", "u" -> "う", "e" -> "え", "o" -> "お",
    "ka" -> "か", "ki" -> "き", "ku" -> "く", "ke" -> "け", "ko" -> "こ",
    "ga" -> "が", "gi" -> "ぎ", "gu" -> "ぐ", "ge" -> "げ", "go" -> "ご",
    "sa" -> "さ", "shi" -> "し", "si" -> "し", "su" -> "す", "se" -> "せ", "so" -> "そ",
    "za" -> "ざ", "ji" -> "じ", "zi" -> "じ", "zu" -> "ず", "ze" -> "ぜ", "zo" -> "ぞ",
    "ta" -> "た", "chi" -> "ち", "ti" -> "ち", "tsu" -> "つ", "tu" -> "つ",
    "te" -> "て", "to" -> "と",
    "da" -> "だ", "di" -> "ぢ", "du" -> "づ", "de" -> "で", "do" -> "ど",
    "na" -> "な", "ni" -> "に", "nu" -> "ぬ", "ne" -> "ね", "no" -> "の",
    "ha" -> "は", "hi" -> "ひ", "fu" -> "ふ", "hu" -> "ふ", "he" -> "へ", "ho" -> "ほ",
    "ba" -> "ば", "bi" -> "び", "bu" -> "ぶ", "be" -> "べ", "bo" -> "ぼ",
    "pa" -> "ぱ", "pi" -> "ぴ", "pu" -> "ぷ", "pe" -> "ぺ", "po" -> "ぽ",
    "ma" -> "ま", "mi" -> "み", "mu" -> "む", "me" -> "め", "mo" -> "も",
    "ya" -> "や", "yu" -> "ゆ", "yo" -> "よ",
    "ra" -> "ら", "ri" -> "り", "ru" -> "る", "re" -> "れ", "ro" -> "ろ",
    "wa" -> "わ", "wo" -> "を",
    "kya" -> "きゃ", "kyu" -> "きゅ", "kyo" -> "きょ",
    "gya" -> "ぎゃ", "gyu" -> "ぎゅ", "gyo" -> "ぎょ",
    "sha" -> "しゃ", "shu" -> "しゅ", "sho" -> "しょ",
    "sya" -> "しゃ", "syu" -> "しゅ", "syo" -> "しょ",
    "ja" -> "じゃ", "ju" -> "じゅ", "jo" -> "じょ",
    "cha" -> "ちゃ", "chu" -> "ちゅ", "cho" -> "ちょ",
    "tya" -> "ちゃ", "tyu" -> "ちゅ", "tyo" -> "ちょ",
    "nya" -> "にゃ", "nyu" -> "にゅ", "nyo" -> "にょ",
    "hya" -> "ひゃ", "hyu" -> "ひゅ", "hyo" -> "ひょ",
    "bya" -> "びゃ", "byu" -> "びゅ", "byo" -> "びょ",
    "pya" -> "ぴゃ", "pyu" -> "ぴゅ", "pyo" -> "ぴょ",
    "mya" -> "みゃ", "myu" -> "みゅ", "myo" -> "みょ",
    "rya" -> "りゃ", "ryu" -> "りゅ", "ryo" -> "りょ")

  private val maxKeyLen = base.keys.map(_.length).max

  /** kana continuations of a lone consonant prefix ("k" -> か,き,く,け,こ,きゃ…) */
  private def rowExpansions(c: String): Seq[String] =
    base.collect { case (k, v) if k.startsWith(c) && k.length > c.length => v }.toSeq.distinct

  /** Convert a full romaji string greedily; None if some syllable is not
    * convertible. Handles sokuon (double consonant -> っ) and syllabic n. */
  def toHiragana(romaji: String): Option[String] = {
    val s = romaji.toLowerCase
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      // sokuon: doubled consonant (kk, pp, ...) other than nn
      if (i + 1 < s.length && s.charAt(i) == s.charAt(i + 1) &&
          "kstpgzdbhfrc".indexOf(s.charAt(i)) >= 0) {
        sb.append('っ'); i += 1
      } else {
        var l = math.min(maxKeyLen, s.length - i)
        var hit: String = null
        while (hit == null && l >= 1) {
          base.get(s.substring(i, i + l)) match {
            case Some(k) => hit = k; i += l
            case None => l -= 1
          }
        }
        if (hit == null) {
          // syllabic n before a consonant or at end
          if (s.charAt(i) == 'n') { sb.append('ん'); i += 1 }
          else return None
        } else sb.append(hit)
      }
    }
    Some(sb.toString)
  }

  /** hiragana strings a romaji PREFIX can start with */
  def candidates(prefix: String): Seq[String] = {
    val s = prefix.toLowerCase
    // split into (complete syllable part, trailing consonant cluster)
    var cut = s.length
    while (cut > 0 && "aiueo".indexOf(s.charAt(cut - 1)) < 0) cut -= 1
    val headRomaji = s.substring(0, cut)
    val tail = s.substring(cut)
    toHiragana(headRomaji) match {
      case None => Nil
      case Some(head) =>
        if (tail.isEmpty) Seq(head)
        else if (tail == "n") Seq(head + "ん") ++ rowExpansions("n").map(head + _)
        else {
          val exps = rowExpansions(tail)
          val sokuon = // doubled consonant tail: expand remainder after っ
            if (tail.length >= 2 && tail(0) == tail(1))
              rowExpansions(tail.drop(1)).map(head + "っ" + _)
            else Nil
          exps.map(head + _) ++ sokuon
        }
    }
  }
}
