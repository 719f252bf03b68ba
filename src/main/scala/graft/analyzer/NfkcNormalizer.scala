package graft.analyzer

/** Option surface of the reference's NormalizerNFKC family
  * (/root/reference/lib/grn_nfkc.h:39-73, defaults in lib/nfkc.c:54-94:
  * everything off except remove_new_line). Field order follows the
  * reference struct. */
final case class NfkcOptions(
    unifyLatinAlphabetWith: Boolean = false,
    unifyKana: Boolean = false,
    unifyKanaCase: Boolean = false,
    unifyKanaVoicedSoundMark: Boolean = false,
    unifyHyphen: Boolean = false,
    unifyProlongedSoundMark: Boolean = false,
    unifyHyphenAndProlongedSoundMark: Boolean = false,
    unifyMiddleDot: Boolean = false,
    unifyKatakanaVSounds: Boolean = false,
    unifyKatakanaBuSound: Boolean = false,
    unifyKatakanaDuSmallSounds: Boolean = false,
    unifyKatakanaDuSound: Boolean = false,
    unifyKatakanaZuSmallSounds: Boolean = false,
    unifyKatakanaWoSound: Boolean = false,
    unifyKatakanaDiSound: Boolean = false,
    unifyKatakanaGuSmallSounds: Boolean = false,
    unifyKanaHyphen: Boolean = false,
    unifyKanaProlongedSoundMark: Boolean = false,
    unifyKatakanaTrailingO: Boolean = false,
    unifyIterationMark: Boolean = false,
    unifyToRomaji: Boolean = false,
    unifyToKatakana: Boolean = false,
    removeBlank: Boolean = false,
    removeNewLine: Boolean = true,
    removeSymbol: Boolean = false,
    strip: Boolean = false)

object NfkcOptions {
  /** parse "unify_kana=true,remove_symbol=true" (the reference option names,
    * lib/normalizer.c options parsing) */
  def parse(spec: String): NfkcOptions =
    spec.split(',').map(_.trim).filter(_.nonEmpty).foldLeft(NfkcOptions()) { (o, kv) =>
      kv.split("=", 2) match {
        case Array(k, v) => set(o, k, v.toBoolean)
        case Array(k) => set(o, k, true)
        case _ => throw new IllegalArgumentException(s"bad nfkc option: $kv")
      }
    }

  def set(o: NfkcOptions, key: String, v: Boolean): NfkcOptions = key match {
    case "unify_latin_alphabet_with" => o.copy(unifyLatinAlphabetWith = v)
    case "unify_kana" => o.copy(unifyKana = v)
    case "unify_kana_case" => o.copy(unifyKanaCase = v)
    case "unify_kana_voiced_sound_mark" => o.copy(unifyKanaVoicedSoundMark = v)
    case "unify_hyphen" => o.copy(unifyHyphen = v)
    case "unify_prolonged_sound_mark" => o.copy(unifyProlongedSoundMark = v)
    case "unify_hyphen_and_prolonged_sound_mark" =>
      o.copy(unifyHyphenAndProlongedSoundMark = v)
    case "unify_middle_dot" => o.copy(unifyMiddleDot = v)
    case "unify_katakana_v_sounds" => o.copy(unifyKatakanaVSounds = v)
    case "unify_katakana_bu_sound" => o.copy(unifyKatakanaBuSound = v)
    case "unify_katakana_du_small_sounds" => o.copy(unifyKatakanaDuSmallSounds = v)
    case "unify_katakana_du_sound" => o.copy(unifyKatakanaDuSound = v)
    case "unify_katakana_zu_small_sounds" => o.copy(unifyKatakanaZuSmallSounds = v)
    case "unify_katakana_wo_sound" => o.copy(unifyKatakanaWoSound = v)
    case "unify_katakana_di_sound" => o.copy(unifyKatakanaDiSound = v)
    case "unify_katakana_gu_small_sounds" => o.copy(unifyKatakanaGuSmallSounds = v)
    case "unify_kana_hyphen" => o.copy(unifyKanaHyphen = v)
    case "unify_kana_prolonged_sound_mark" => o.copy(unifyKanaProlongedSoundMark = v)
    case "unify_katakana_trailing_o" => o.copy(unifyKatakanaTrailingO = v)
    case "unify_iteration_mark" => o.copy(unifyIterationMark = v)
    case "unify_to_romaji" => o.copy(unifyToRomaji = v)
    case "unify_to_katakana" => o.copy(unifyToKatakana = v)
    case "remove_blank" => o.copy(removeBlank = v)
    case "remove_new_line" => o.copy(removeNewLine = v)
    case "remove_symbol" => o.copy(removeSymbol = v)
    case "strip" => o.copy(strip = v)
    case other => throw new IllegalArgumentException(s"unknown nfkc option: $other")
  }
}

/** NormalizerNFKC with the reference's full `unify_*` / `remove_*` / `strip`
  * option family, re-derived at codepoint level from the reference semantics
  * (/root/reference/lib/normalizer.c:1808-4280, lib/romaji.c) and verified
  * against goldens transcribed from the reference normalizer test suite
  * (test/command/suite/normalizers/nfkc expected transcripts,
  * NormalizerGoldenSpec).
  *
  * Base decomposition delegates to JDK NFKC tables plus the reference's
  * custom rule file (lib/nfkc-custom-rules.txt: U+301C WAVE DASH -> '~');
  * case folding is per-codepoint (the reference's tables fold case
  * context-insensitively, so final-sigma style contextual lowercasing must
  * NOT apply).
  *
  * Pass pipeline (exact reference order, lib/normalizer.c:3834-4170):
  *   NFKC+fold -> remove -> stateless-before(latin, kana, to_katakana,
  *   voiced-mark, hyphen, prolonged, hyphen+prolonged, middle-dot) ->
  *   v_sounds -> bu -> du_small -> du -> zu_small -> wo -> di -> gu_small ->
  *   kana_hyphen -> kana_prolonged -> trailing_o -> iteration ->
  *   kana_case -> romaji -> strip
  */
object NfkcNormalizer {

  // ---- codepoint helpers -------------------------------------------------

  private def isHiraganaCp(cp: Int): Boolean =
    (cp >= 0x3041 && cp <= 0x3096) || cp == 0x309D || cp == 0x309E
  private def isKatakanaCp(cp: Int): Boolean =
    (cp >= 0x30A1 && cp <= 0x30FA) || cp == 0x30FC || cp == 0x30FD || cp == 0x30FE
  private def isKanjiCp(cp: Int): Boolean =
    Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN

  /** hyphen family -> '-' (lib/normalizer.c:2129-2177) */
  private val HyphenFamily = Set(0x2D, 0x2D7, 0x58A, 0x2010, 0x2011, 0x2012,
    0x2013, 0x2043, 0x207B, 0x208B, 0x2212)
  /** prolonged-sound-mark family -> U+30FC (lib/normalizer.c:2179-2210) */
  private val ProlongedFamily = Set(0x2014, 0x2015, 0x2500, 0x2501, 0x30FC, 0xFF70)
  /** middle-dot family -> U+00B7 (lib/normalizer.c:2212-2251) */
  private val MiddleDotFamily = Set(0x1427, 0x2022, 0x2219, 0x22C5, 0x2E31,
    0x30FB, 0xFF65, 0xB7)

  // ---- kana tables (all re-derived; reference byte logic noted inline) ----

  /** katakana -> hiragana (unify_kana, lib/normalizer.c:1808) */
  private def kataToHira(cp: Int): Int =
    if ((cp >= 0x30A1 && cp <= 0x30F6) || cp == 0x30FD || cp == 0x30FE) cp - 0x60 else cp

  /** hiragana -> katakana (unify_to_katakana, lib/normalizer.c:2274) */
  private def hiraToKata(cp: Int): Int =
    if ((cp >= 0x3041 && cp <= 0x3096) || cp == 0x309D || cp == 0x309E) cp + 0x60 else cp

  /** small kana -> normal (unify_kana_case, lib/normalizer.c:1835,1882) */
  private def kanaCase(cp: Int): Int = cp match {
    case 0x3041 | 0x3043 | 0x3045 | 0x3047 | 0x3049 | 0x3063 |
        0x3083 | 0x3085 | 0x3087 | 0x308E => cp + 1
    case 0x3095 => 0x304B // small ka -> ka
    case 0x3096 => 0x3051 // small ke -> ke
    case 0x30A1 | 0x30A3 | 0x30A5 | 0x30A7 | 0x30A9 | 0x30C3 |
        0x30E3 | 0x30E5 | 0x30E7 | 0x30EE => cp + 1
    case 0x30F5 => 0x30AB
    case 0x30F6 => 0x30B1
    case _ => cp
  }

  /** drop voiced/semi-voiced marks (unify_kana_voiced_sound_mark,
    * lib/normalizer.c:1929,2023): ga->ka, ba/pa->ha, da->ta, ... */
  private def unvoice(cp: Int): Int = {
    if (cp >= 0x304C && cp <= 0x3062 && (cp & 1) == 0) cp - 1
    else if (cp >= 0x3065 && cp <= 0x3069 && (cp & 1) == 1) cp - 1
    else if (cp >= 0x3070 && cp <= 0x307D) {
      val m = (cp - 0x306F) % 3; if (m != 0) cp - m else cp
    } else if (cp >= 0x30AC && cp <= 0x30C2 && (cp & 1) == 0) cp - 1
    else if (cp >= 0x30C5 && cp <= 0x30C9 && (cp & 1) == 1) cp - 1
    else if (cp >= 0x30D0 && cp <= 0x30DD) {
      val m = (cp - 0x30CF) % 3; if (m != 0) cp - m else cp
    } else cp
  }

  /** add a voiced mark for the voiced iteration marks; None = semi-voiced
    * previous, not processable (lib/normalizer.c:1992,2091) */
  private def voice(cp: Int): Option[Int] = {
    if (cp >= 0x304B && cp <= 0x3062) Some(if ((cp & 1) == 1) cp + 1 else cp)
    else if (cp >= 0x3064 && cp <= 0x3069) Some(if ((cp & 1) == 0) cp + 1 else cp)
    else if (cp >= 0x306F && cp <= 0x307D) {
      (cp - 0x306F) % 3 match {
        case 0 => Some(cp + 1); case 1 => Some(cp); case _ => None
      }
    } else if (cp >= 0x30AB && cp <= 0x30C2) Some(if ((cp & 1) == 1) cp + 1 else cp)
    else if (cp >= 0x30C4 && cp <= 0x30C9) Some(if ((cp & 1) == 0) cp + 1 else cp)
    else if (cp >= 0x30CF && cp <= 0x30DD) {
      (cp - 0x30CF) % 3 match {
        case 0 => Some(cp + 1); case 1 => Some(cp); case _ => None
      }
    } else None
  }

  /** Hepburn romaji of a single kana, ignoring context (youon/sokuon/n
    * handled by the romaji pass). Non-kana -> null. Re-derived from the
    * gojuon structure of lib/romaji.c:389-830. */
  private def baseRomaji(cp0: Int): String = {
    val cp = if (cp0 >= 0x30A1 && cp0 <= 0x30F6) cp0 - 0x60 else cp0 // fold katakana
    cp match {
      case c if c >= 0x3041 && c <= 0x304A => // vowels, small odd
        val v = "aiueo".charAt((c - 0x3041) / 2).toString
        if ((c & 1) == 1) "x" + v else v
      case c if c >= 0x304B && c <= 0x3054 => // ka..go
        val k = if ((c & 1) == 1) "k" else "g"
        k + "aiueo".charAt((c - 0x304B) / 2)
      case 0x3057 => "shi"
      case 0x3058 => "ji"
      case c if c >= 0x3055 && c <= 0x305E => // sa..zo
        val s = if ((c & 1) == 1) "s" else "z"
        s + "aiueo".charAt((c - 0x3055) / 2)
      case 0x305F => "ta"; case 0x3060 => "da"
      case 0x3061 => "chi"; case 0x3062 => "ji"
      case 0x3063 => "xtu" // small tsu standalone form handled in pass
      case 0x3064 => "tsu"; case 0x3065 => "zu"
      case 0x3066 => "te"; case 0x3067 => "de"
      case 0x3068 => "to"; case 0x3069 => "do"
      case c if c >= 0x306A && c <= 0x306E => "n" + "aiueo".charAt(c - 0x306A)
      case c if c >= 0x306F && c <= 0x307D => // ha..po
        val h = (c - 0x306F) % 3 match { case 0 => "h"; case 1 => "b"; case _ => "p" }
        h + "aiueo".charAt((c - 0x306F) / 3)
      case c if c >= 0x307E && c <= 0x3082 => "m" + "aiueo".charAt(c - 0x307E)
      case c if c >= 0x3083 && c <= 0x3088 => // ya/yu/yo (+small)
        val y = "y" + "auo".charAt((c - 0x3083) / 2)
        if ((c & 1) == 1) "x" + y else y
      case c if c >= 0x3089 && c <= 0x308D => "r" + "aiueo".charAt(c - 0x3089)
      case 0x308E => "xwa"
      case c if c >= 0x308F && c <= 0x3092 => "w" + "aaieo".charAt(c - 0x308E)
      case 0x3093 => "n"
      case 0x3094 => "vu"
      case 0x3095 => "xka"; case 0x3096 => "xke"
      // katakana-only va/vi/ve/vo
      case 0x30F7 => "va"; case 0x30F8 => "vi"; case 0x30F9 => "ve"; case 0x30FA => "vo"
      case _ => null
    }
  }

  /** gemination consonant for small-tsu (lib/romaji.c:131-340): ' '
    * means "no consonant" (small tsu renders as xts) */
  private def geminationConsonant(cp: Int): Char = {
    if (cp == 0x3061 || cp == 0x30C1) return 't' // chi geminates as 't' (tchi)
    val r = baseRomaji(cp)
    if (r == null) ' '
    else if (cp == 0x3063 || cp == 0x30C3) 'x' // small tsu itself
    else if (cp == 0x3093 || cp == 0x30F3) 'n' // refined by pbm in pass
    else if (r.charAt(0) >= 'a' && r.charAt(0) <= 'z' && !"aiueo".contains(r.charAt(0))) r.charAt(0)
    else if (r.startsWith("x")) 'x'
    else ' ' // bare vowel kana
  }

  /** vowel class of a kana ('a'..'o'), for kana-hyphen/prolonged unification
    * (lib/normalizer.c:3067-3530 vowel group lists = gojuon columns) */
  private def vowelClass(cp: Int): Char = {
    if (cp == 0x3093 || cp == 0x30F3) 'n' // n maps to itself
    else {
      val r = baseRomaji(cp)
      if (r == null) ' ' else r.charAt(r.length - 1)
    }
  }

  /** is b/p/m consonant kana (grn_romaji_hepburn_is_pbm, lib/romaji.c:23) */
  private def isPbm(cp: Int): Boolean = {
    val r = baseRomaji(cp)
    r != null && (r.charAt(0) == 'b' || r.charAt(0) == 'p' || r.charAt(0) == 'm') &&
      cp != 0x3093 && cp != 0x30F3
  }

  /** is big vowel or big ya/yu/yo (grn_romaji_hepburn_is_aiueoy) */
  private def isAiueoy(cp: Int): Boolean = cp match {
    case 0x3042 | 0x3044 | 0x3046 | 0x3048 | 0x304A | 0x3084 | 0x3086 | 0x3088 |
        0x30A2 | 0x30A4 | 0x30A6 | 0x30A8 | 0x30AA | 0x30E4 | 0x30E6 | 0x30E8 => true
    case _ => false
  }

  // ---- passes --------------------------------------------------------------

  /** JDK NFKC + reference custom rules + context-free case fold.
    * Pre-maps the spacing kana sound marks U+309B/U+309C to their combining
    * forms: the reference tables map them directly (no compatibility space),
    * unlike stock Unicode NFKC. */
  private def baseNormalize(raw: String): Array[Int] = {
    val pre =
      if (raw.indexOf('\u309B') < 0 && raw.indexOf('\u309C') < 0) raw
      else raw.replace('\u309B', '\u3099').replace('\u309C', '\u309A')
    val nfkc =
      if (java.text.Normalizer.isNormalized(pre, java.text.Normalizer.Form.NFKC)) pre
      else java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFKC)
    val out = new graft.codec.IntVec(nfkc.length)
    var i = 0
    while (i < nfkc.length) {
      val cp = nfkc.codePointAt(i)
      // custom rule (lib/nfkc-custom-rules.txt): WAVE DASH -> '~'
      if (cp == 0x301C) out += '~'
      else out += Character.toLowerCase(cp)
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private def isSymbolType(cp: Int): Boolean =
    Normalizer.classify(cp) == CharClass.Symbol

  /** removal pass (lib/normalizer.c:4197-4258): unprintable ascii always,
    * ' ' with remove_blank, CR/LF with remove_new_line, symbols with
    * remove_symbol (plus unified families when their unify option is on) */
  private def removePass(cps: Array[Int], o: NfkcOptions): Array[Int] = {
    val out = new graft.codec.IntVec(cps.length)
    var i = 0
    while (i < cps.length) {
      val cp = cps(i)
      val removeAsBlank =
        cp < 0x21 && (cp match {
          case 0x20 => o.removeBlank
          case 0x0D | 0x0A => o.removeNewLine
          case _ => true // unprintable ascii controls always removed
        })
      val removeAsSymbol = !removeAsBlank && o.removeSymbol && (
        isSymbolType(cp) ||
          (o.unifyHyphenAndProlongedSoundMark &&
            (HyphenFamily.contains(cp) || ProlongedFamily.contains(cp))) ||
          (o.unifyMiddleDot && MiddleDotFamily.contains(cp)))
      if (!removeAsBlank && !removeAsSymbol) out += cp
      i += 1
    }
    out.toArray
  }

  /** unify_latin_alphabet_with: diacritic-carrying Latin letter -> its ASCII
    * base. The reference enumerates the codepoints (lib/normalizer.c:850-1806);
    * the set is exactly "NFD = one a-z letter + combining marks". */
  private def latinBase(cp: Int): Int = {
    if (cp < 0x80 || cp > 0x2000 || !Character.isLetter(cp)) return cp
    val d = java.text.Normalizer.normalize(
      new String(Character.toChars(cp)), java.text.Normalizer.Form.NFD)
    if (d.length < 2) return cp
    val base = d.charAt(0)
    if (base < 'a' || base > 'z') return cp
    var k = 1
    while (k < d.length) {
      if (Character.getType(d.charAt(k)) != Character.NON_SPACING_MARK) return cp
      k += 1
    }
    base.toInt
  }

  /** stateless before-pass, reference order (lib/normalizer.c:2311-2470) */
  private def statelessBefore(cps: Array[Int], o: NfkcOptions): Array[Int] = {
    val unifyHp = o.unifyHyphenAndProlongedSoundMark && !o.removeSymbol
    val unifyMd = o.unifyMiddleDot && !o.removeSymbol
    val out = new Array[Int](cps.length)
    var i = 0
    while (i < cps.length) {
      var cp = cps(i)
      if (o.unifyLatinAlphabetWith) cp = latinBase(cp)
      if (o.unifyKana && isKatakanaCp(cp)) cp = kataToHira(cp)
      if (o.unifyToKatakana && isHiraganaCp(cp)) cp = hiraToKata(cp)
      if (o.unifyKanaVoicedSoundMark) cp = unvoice(cp)
      if (o.unifyHyphen && HyphenFamily.contains(cp)) cp = '-'
      if (o.unifyProlongedSoundMark && ProlongedFamily.contains(cp)) cp = 0x30FC
      if (unifyHp && (HyphenFamily.contains(cp) || ProlongedFamily.contains(cp))) cp = '-'
      if (unifyMd && MiddleDotFamily.contains(cp)) cp = 0xB7
      out(i) = cp
      i += 1
    }
    out
  }

  /** stateful pass runner: f(input, i) returns (emitted codepoints, consumed
    * count) and sees the ORIGINAL pass input for look-back/ahead, exactly
    * like grn_nfkc_normalize_unify_stateful's current/end pointers. */
  private def statefulPass(cps: Array[Int])(f: (Array[Int], Int) => (Seq[Int], Int)): Array[Int] = {
    val out = new graft.codec.IntVec(cps.length)
    var i = 0
    while (i < cps.length) {
      val (emit, used) = f(cps, i)
      emit.foreach(out += _)
      i += math.max(1, used)
    }
    out.toArray
  }

  /** small vowel companion tables for the katakana contraction passes */
  private val SmallVowelIndex = Map(0x30A1 -> 0, 0x30A3 -> 1, 0x30A5 -> 2,
    0x30A7 -> 3, 0x30A9 -> 4)

  private def vSounds(cps: Array[Int], i: Int): (Seq[Int], Int) = {
    if (cps(i) == 0x30F4) { // vu
      val next = if (i + 1 < cps.length) cps(i + 1) else -1
      next match {
        case 0x30A1 => (Seq(0x30D0), 2) // va -> ba
        case 0x30A3 => (Seq(0x30D3), 2) // vi -> bi
        case 0x30A5 => (Seq(0x30D6), 2) // vu -> bu
        case 0x30A7 => (Seq(0x30D9), 2) // ve -> be
        case 0x30A9 => (Seq(0x30DC), 2) // vo -> bo
        case _ => (Seq(0x30D6), 1) // lone vu -> bu
      }
    } else (Seq(cps(i)), 1)
  }

  private def buSound(cps: Array[Int], i: Int): (Seq[Int], Int) = {
    if (cps(i) == 0x30F4) {
      val next = if (i + 1 < cps.length) cps(i + 1) else -1
      val used = if (SmallVowelIndex.contains(next)) 2 else 1
      (Seq(0x30D6), used)
    } else (Seq(cps(i)), 1)
  }

  /** DU/ZU/GU + small vowel contractions (za-row / ga-row targets) */
  private def smallSoundPass(trigger: Int, targets: Map[Int, Int])(
      cps: Array[Int], i: Int): (Seq[Int], Int) = {
    if (cps(i) == trigger && i + 1 < cps.length && targets.contains(cps(i + 1)))
      (Seq(targets(cps(i + 1))), 2)
    else (Seq(cps(i)), 1)
  }

  private val DuSmallTargets = Map(0x30A1 -> 0x30B6, 0x30A3 -> 0x30B8,
    0x30A7 -> 0x30BC, 0x30A9 -> 0x30BE) // za zi ze zo
  private val GuSmallTargets = Map(0x30A1 -> 0x30AC, 0x30A3 -> 0x30AE,
    0x30A7 -> 0x30B2, 0x30A9 -> 0x30B4) // ga gi ge go

  /** kana + mark -> vowel kana of the same script
    * (grn_nfkc_normalize_unify_kana_prolonged_sound_mark_like) */
  private def kanaMarkPass(mark: Int)(cps: Array[Int], i: Int): (Seq[Int], Int) = {
    val cp = cps(i)
    if (cp == mark && i > 0) {
      val prev = cps(i - 1)
      val vc = vowelClass(prev)
      if (vc == 'n') (Seq(prev), 1) // n/N repeats itself
      else if (vc != ' ' && prev != 0x3063 && prev != 0x30C3) {
        val hira = isHiraganaCp(prev)
        val vowel = "aiueo".indexOf(vc) match {
          case -1 => -1
          case k => (if (hira) 0x3042 else 0x30A2) + 2 * k
        }
        if (vowel > 0) (Seq(vowel), 1) else (Seq(cp), 1)
      } else (Seq(cp), 1)
    } else (Seq(cp), 1)
  }

  /** katakana trailing O: o-column kana + O -> U (lib/normalizer.c:2958) */
  private val TrailingOTriggers = Set(0x30A9, 0x30AA, 0x30B3, 0x30BD, 0x30C8,
    0x30CE, 0x30DB, 0x30E2, 0x30E7, 0x30E8, 0x30ED, 0x30B4, 0x30BE, 0x30C9,
    0x30DC, 0x30DD, 0x30FA)

  private def trailingO(cps: Array[Int]): Array[Int] = {
    val out = new Array[Int](cps.length)
    var check = false
    var i = 0
    while (i < cps.length) {
      val cp = cps(i)
      if (check && cp == 0x30AA) { out(i) = 0x30A6; check = false }
      else { out(i) = cp; check = TrailingOTriggers.contains(cp) }
      i += 1
    }
    out
  }

  /** iteration marks (lib/normalizer.c:3551-3830): hiragana/katakana marks
    * repeat the previous INPUT kana (un)voiced; ideographic marks repeat the
    * previous kanji. */
  private def iterationMark(cps: Array[Int], i: Int): (Seq[Int], Int) = {
    val cp = cps(i)
    val prev = if (i > 0) cps(i - 1) else -1
    cp match {
      case 0x309D if prev >= 0 && isHiraganaCp(prev) => (Seq(unvoice(prev)), 1)
      case 0x309E if prev >= 0 && isHiraganaCp(prev) =>
        voice(prev) match { case Some(v) => (Seq(v), 1); case None => (Seq(cp), 1) }
      case 0x30FD if prev >= 0 && isKatakanaCp(prev) => (Seq(unvoice(prev)), 1)
      case 0x30FE if prev >= 0 && isKatakanaCp(prev) =>
        voice(prev) match { case Some(v) => (Seq(v), 1); case None => (Seq(cp), 1) }
      case 0x3005 | 0x303B if prev >= 0 && isKanjiCp(prev) => (Seq(prev), 1)
      case _ => (Seq(cp), 1)
    }
  }

  /** Hepburn romaji pass (lib/romaji.c grn_romaji_hepburn_convert) */
  private def romaji(cps: Array[Int], i: Int): (Seq[Int], Int) = {
    val cp = cps(i)
    val next = if (i + 1 < cps.length) cps(i + 1) else -1
    val base = baseRomaji(cp)
    if (base == null) return (Seq(cp), 1)

    // small-tsu gemination: double the next consonant, xts standalone
    if (cp == 0x3063 || cp == 0x30C3) {
      val c = if (next >= 0) {
        val g = geminationConsonant(next)
        if (g == 'n' && (next == 0x3093 || next == 0x30F3)) {
          // n's consonant depends on ITS next char (pbm -> m)
          val nn = if (i + 2 < cps.length) cps(i + 2) else -1
          if (nn >= 0 && isPbm(nn)) 'm' else 'n'
        } else g
      } else ' '
      return if (c == ' ') (Seq('x'.toInt, 't'.toInt, 's'.toInt), 1)
      else (Seq(c.toInt), 1)
    }

    // n: m before p/b/m kana, "-" separator before vowels/y kana
    if (cp == 0x3093 || cp == 0x30F3) {
      val head = if (next >= 0 && isPbm(next)) 'm' else 'n'
      return if (next >= 0 && isAiueoy(next))
        (Seq(head.toInt, '-'.toInt), 1) else (Seq(head.toInt), 1)
    }

    // youon: i-column kana + small ya/yu/yo contract
    val smallY = next match {
      case 0x3083 | 0x30E3 => 'a'
      case 0x3085 | 0x30E5 => 'u'
      case 0x3087 | 0x30E7 => 'o'
      case _ => ' '
    }
    if (smallY != ' ' && base.length >= 2 && base.endsWith("i") && !base.startsWith("x")) {
      val prefix = base.substring(0, base.length - 1) match {
        case "sh" => "sh" // shi + ya -> sha
        case "ch" => "ch"
        case "j" => "j"
        case c => c + "y" // ki -> ky, ni -> ny, ...
      }
      return ((prefix + smallY).map(_.toInt), 2)
    }
    (base.map(_.toInt), 1)
  }

  /** strip: leading+trailing ' ' (lib/normalizer.c grn_nfkc_normalize_strip) */
  private def stripPass(cps: Array[Int]): Array[Int] = {
    var a = 0
    var b = cps.length
    while (a < b && cps(a) == ' ') a += 1
    while (b > a && cps(b - 1) == ' ') b -= 1
    java.util.Arrays.copyOfRange(cps, a, b)
  }

  // ---- entry ---------------------------------------------------------------

  def normalize(raw: String, o: NfkcOptions = NfkcOptions()): String = {
    if (raw == null || raw.isEmpty) return ""
    var cps = removePass(baseNormalize(raw), o)
    val anyStatelessBefore = o.unifyLatinAlphabetWith || o.unifyKana ||
      o.unifyKanaVoicedSoundMark || o.unifyHyphen || o.unifyProlongedSoundMark ||
      (o.unifyHyphenAndProlongedSoundMark && !o.removeSymbol) ||
      (o.unifyMiddleDot && !o.removeSymbol) || o.unifyToKatakana
    if (anyStatelessBefore) cps = statelessBefore(cps, o)
    if (o.unifyKatakanaVSounds) cps = statefulPass(cps)(vSounds)
    if (o.unifyKatakanaBuSound) cps = statefulPass(cps)(buSound)
    if (o.unifyKatakanaDuSmallSounds) cps = statefulPass(cps)(smallSoundPass(0x30C5, DuSmallTargets))
    if (o.unifyKatakanaDuSound) cps = cps.map(c => if (c == 0x30C5) 0x30BA else c)
    if (o.unifyKatakanaZuSmallSounds) cps = statefulPass(cps)(smallSoundPass(0x30BA, DuSmallTargets))
    if (o.unifyKatakanaWoSound) cps = cps.map(c => if (c == 0x30F2) 0x30AA else c)
    if (o.unifyKatakanaDiSound) cps = cps.map(c => if (c == 0x30C2) 0x30B8 else c)
    if (o.unifyKatakanaGuSmallSounds) cps = statefulPass(cps)(smallSoundPass(0x30B0, GuSmallTargets))
    if (o.unifyKanaHyphen) cps = statefulPass(cps)(kanaMarkPass('-'))
    if (o.unifyKanaProlongedSoundMark) cps = statefulPass(cps)(kanaMarkPass(0x30FC))
    if (o.unifyKatakanaTrailingO) cps = trailingO(cps)
    if (o.unifyIterationMark) cps = statefulPass(cps)(iterationMark)
    if (o.unifyKanaCase) cps = cps.map(kanaCase)
    if (o.unifyToRomaji) cps = statefulPass(cps)(romaji)
    if (o.strip) cps = stripPass(cps)
    new String(cps, 0, cps.length)
  }
}
