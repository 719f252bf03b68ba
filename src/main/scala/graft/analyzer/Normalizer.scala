package graft.analyzer

/** Character classes tracked by the normalizer and consumed by the n-gram
  * tokenizer's `unify_*` grouping logic.
  *
  * Mirrors the semantic role of groonga's `ctypes` attached to normalized
  * text (reference: /root/reference/lib/tokenizers.c:663-672 reads the
  * char-type array produced by the normalizer; class-driven grouping at
  * /root/reference/lib/tokenizers.c:973-1158). The class *partition* here is
  * our own: we only need the distinctions the tokenizer branches on.
  */
object CharClass {
  final val Null: Byte = 0
  final val Alpha: Byte = 1 // letters of bicameral/latin-like scripts
  final val Digit: Byte = 2
  final val Symbol: Byte = 3 // punctuation, marks, math symbols
  final val Blank: Byte = 4 // whitespace
  final val Other: Byte = 5 // CJK & scripts tokenized by n-gram
}

/** Normalized text: code points (as a String) plus one class byte per
  * char of the normalized string.
  */
final case class Normalized(text: String, classes: Array[Byte])

/** Normalized text with a per-normalized-char mapping back to source char
  * offsets — the role of groonga's normalizer `checks` array
  * (/root/reference/lib/normalizer.c offset bookkeeping). `srcStart(i)`/
  * `srcEnd(i)` bound the raw chars that produced normalized char i. */
final case class NormalizedWithOffsets(
    text: String, classes: Array[Byte], srcStart: Array[Int], srcEnd: Array[Int])

/** Unicode NFKC + case-fold normalizer.
  *
  * Semantic counterpart of groonga's `NormalizerNFKC*` family
  * (/root/reference/lib/normalizer.c:6415-6467): NFKC decomposition +
  * compatibility mapping + downcasing. We delegate the NFKC tables to the
  * JDK (`java.text.Normalizer`, Unicode tables shipped with the JRE) rather
  * than carrying generated tables; the groonga-specific `unify_kana` etc.
  * options are out of scope for v1 (defaults off in the reference too).
  */
object Normalizer {

  def classify(cp: Int): Byte = {
    if (cp <= 0x7f) { // fast ASCII path
      if (cp >= 'a' && cp <= 'z' || cp >= 'A' && cp <= 'Z') CharClass.Alpha
      else if (cp >= '0' && cp <= '9') CharClass.Digit
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f') CharClass.Blank
      else CharClass.Symbol
    } else {
      import Character._
      getType(cp) match {
        case SPACE_SEPARATOR | LINE_SEPARATOR | PARAGRAPH_SEPARATOR => CharClass.Blank
        case DECIMAL_DIGIT_NUMBER => CharClass.Digit
        case UPPERCASE_LETTER | LOWERCASE_LETTER | TITLECASE_LETTER =>
          // Latin/Greek/Cyrillic-like letters unify into word tokens; CJK
          // ideographs and kana are OTHER_LETTER and fall through to Other.
          CharClass.Alpha
        case MODIFIER_LETTER | OTHER_LETTER =>
          CharClass.Other
        case CONNECTOR_PUNCTUATION | DASH_PUNCTUATION | START_PUNCTUATION | END_PUNCTUATION |
            INITIAL_QUOTE_PUNCTUATION | FINAL_QUOTE_PUNCTUATION | OTHER_PUNCTUATION |
            MATH_SYMBOL | CURRENCY_SYMBOL | MODIFIER_SYMBOL | OTHER_SYMBOL =>
          CharClass.Symbol
        case CONTROL | FORMAT => CharClass.Blank
        case _ => CharClass.Symbol
      }
    }
  }

  /** NFKC-normalize, lowercase, and classify. Pure and deterministic. */
  def normalize(raw: String): Normalized = {
    if (raw == null || raw.isEmpty) return Normalized("", Array.emptyByteArray)
    val nfkc =
      if (java.text.Normalizer.isNormalized(raw, java.text.Normalizer.Form.NFKC)) raw
      else java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFKC)
    val lowered = nfkc.toLowerCase(java.util.Locale.ROOT)
    val classes = new Array[Byte](lowered.length)
    var i = 0
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if (Character.isHighSurrogate(c) && i + 1 < lowered.length &&
          Character.isLowSurrogate(lowered.charAt(i + 1))) {
        val cls = classify(lowered.codePointAt(i))
        classes(i) = cls; classes(i + 1) = cls
        i += 2
      } else {
        classes(i) = classify(c)
        i += 1
      }
    }
    Normalized(lowered, classes)
  }

  /** Resolve a reference normalizer NAME to a text→text function — the
    * `normalize` command surface (reference registrations at
    * lib/normalizer.c:6415-6472). NormalizerAuto is the legacy
    * encoding-dispatched normalizer; for UTF-8 (the only encoding here) it
    * is Unicode KC normalization + case folding, i.e. this engine's base
    * normalize pass. Versioned NFKC names differ only by Unicode table
    * vintage — all resolve to the JDK's tables (current Unicode), options
    * in parentheses parse as the NFKC option family. */
  def byName(spec: String): String => String = {
    val p = spec.indexOf('(')
    val (name, args) =
      if (p < 0) (spec, "")
      else {
        require(spec.endsWith(")"), s"malformed normalizer spec: $spec")
        (spec.take(p), spec.substring(p + 1, spec.length - 1))
      }
    name match {
      case "NormalizerAuto" => s => normalize(s).text
      case "NormalizerNFKC" | "NormalizerNFKC51" | "NormalizerNFKC100" |
          "NormalizerNFKC121" | "NormalizerNFKC130" | "NormalizerNFKC150" |
          "NormalizerNFKC160" =>
        val opts = NfkcOptions.parse(args)
        s => NfkcNormalizer.normalize(s, opts)
      case "NormalizerHTML" =>
        var o = HtmlNormalizer.Options()
        args.split(',').map(_.trim).filter(_.nonEmpty).foreach { kv =>
          kv.split("=", 2) match {
            case Array("remove_tag", v) => o = o.copy(removeTag = v.toBoolean)
            case Array("expand_character_reference", v) =>
              o = o.copy(expandCharacterReference = v.toBoolean)
            case _ => throw new IllegalArgumentException(s"bad NormalizerHTML option: $kv")
          }
        }
        val opts = o
        s => HtmlNormalizer.normalize(s, opts)
      case "NormalizerTable" =>
        val rules = TableNormalizer.parseSpecArgs(args)
        s => TableNormalizer.normalize(s, rules)
      case other => throw new IllegalArgumentException(s"unknown normalizer: $other")
    }
  }

  /** Offset-tracking variant for highlight/snippet: NFKC is applied PER
    * CODE POINT (compatibility mappings like full-width→ASCII, ligature
    * expansion, and lowercasing are per-codepoint, so offsets stay exact
    * for them; cross-codepoint composition — e.g. e + combining acute —
    * is not re-composed here, unlike normalize()). Offsets are char
    * indices into the raw string. */
  def normalizeWithOffsets(raw: String): NormalizedWithOffsets = {
    if (raw == null || raw.isEmpty)
      return NormalizedWithOffsets("", Array.emptyByteArray,
        Array.emptyIntArray, Array.emptyIntArray)
    val sb = new java.lang.StringBuilder(raw.length)
    val starts = new graft.codec.IntVec(raw.length)
    val ends = new graft.codec.IntVec(raw.length)
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      val cc = Character.charCount(cp)
      val piece = new String(Character.toChars(cp))
      val norm = (
        if (java.text.Normalizer.isNormalized(piece, java.text.Normalizer.Form.NFKC)) piece
        else java.text.Normalizer.normalize(piece, java.text.Normalizer.Form.NFKC)
      ).toLowerCase(java.util.Locale.ROOT)
      var k = 0
      while (k < norm.length) {
        sb.append(norm.charAt(k))
        starts += i
        ends += i + cc
        k += 1
      }
      i += cc
    }
    val text = sb.toString
    val classes = new Array[Byte](text.length)
    var j = 0
    while (j < text.length) {
      val c = text.charAt(j)
      if (Character.isHighSurrogate(c) && j + 1 < text.length &&
          Character.isLowSurrogate(text.charAt(j + 1))) {
        val cls = classify(text.codePointAt(j))
        classes(j) = cls; classes(j + 1) = cls
        j += 2
      } else {
        classes(j) = classify(c)
        j += 1
      }
    }
    NormalizedWithOffsets(text, classes, starts.toArray, ends.toArray)
  }
}
