package graft.analyzer

import org.apache.spark.sql.{DataFrame, Encoders}

/** NormalizerHTML: strip tags + expand HTML character references.
  *
  * Re-expression of the reference's NormalizerHTML
  * (/root/reference/lib/normalizer.c:6181-6360, registered at :6472) with
  * its exact state machine:
  *
  *  - TEXT:        `<` (remove_tag) → IN_TAG; `&` (expand_character_reference)
  *                 → IN_CHAR_REF; anything else copied through.
  *  - IN_TAG:      everything up to and including `>` is dropped; an
  *                 unterminated tag at end of input is dropped too
  *                 (normalizer.c:6346-6353).
  *  - IN_CHAR_REF: `[A-Za-z0-9]` accumulate, `#` only directly after `&`;
  *                 `;` attempts expansion — named refs via the WHATWG table,
  *                 `&#D;` / `&#xH;` numerically. On any other character the
  *                 reference's switch falls through into the default state
  *                 handler (normalizer.c:6293-6310): `<` (remove_tag) DROPS
  *                 the pending `&...` and opens a tag, `&` (expand) drops it
  *                 and restarts a reference; anything else — including an
  *                 invalid `;` reference — is written back literally
  *                 including the offending character. (One deliberate
  *                 divergence, documented at the flush site: the reference
  *                 also double-writes that terminating character via a
  *                 second missing-break fallthrough; we write it once.) An
  *                 unterminated reference at end of input is dropped
  *                 (mirroring the post-loop handling, which only flushes
  *                 IN_TAG).
  *
  * Numeric references follow the HTML numeric-character-reference-end rules
  * the reference transcribes (normalizer.c:6086-6180): code points
  * 0x80-0x9F remap through the windows-1252 table, and 0, surrogates and
  * out-of-range become U+FFFD (str.c grn_text_code_point:2699).
  *
  * Named references: the reference ships the full generated WHATWG table
  * (normalizer_html_expand_named_char_ref.c, ~2.2k names). We carry the
  * complete HTML4 entity set plus `apos` (253 names — the set that occurs
  * in practice on web corpora); exotic HTML5-only names (`&commat;` etc.)
  * fall back to the literal-as-is path. Names are case-sensitive and
  * require the terminating `;`, as in the reference.
  */
object HtmlNormalizer {

  final case class Options(
      removeTag: Boolean = true,
      expandCharacterReference: Boolean = true)

  /** windows-1252 remapping of numeric refs in 0x80-0x9F
    * (normalizer.c:6092-6176). */
  private def remapNumeric(cp: Long): Int = cp match {
    case 0x80 => 0x20AC; case 0x82 => 0x201A; case 0x83 => 0x0192
    case 0x84 => 0x201E; case 0x85 => 0x2026; case 0x86 => 0x2020
    case 0x87 => 0x2021; case 0x88 => 0x02C6; case 0x89 => 0x2030
    case 0x8A => 0x0160; case 0x8B => 0x2039; case 0x8C => 0x0152
    case 0x8E => 0x017D; case 0x91 => 0x2018; case 0x92 => 0x2019
    case 0x93 => 0x201C; case 0x94 => 0x201D; case 0x95 => 0x2022
    case 0x96 => 0x2013; case 0x97 => 0x2014; case 0x98 => 0x02DC
    case 0x99 => 0x2122; case 0x9A => 0x0161; case 0x9B => 0x203A
    case 0x9C => 0x0153; case 0x9E => 0x017E; case 0x9F => 0x0178
    case c if c == 0 || c > 0x10FFFF || (c >= 0xD800 && c <= 0xDFFF) => 0xFFFD
    case c => c.toInt
  }

  /** HTML4 named entities + apos (name → code point). Public table from the
    * W3C HTML 4.01 DTDs (the reference generates its superset from the
    * WHATWG entities.json). */
  private val named: java.util.HashMap[String, java.lang.Integer] = {
    // value type must be the boxed Integer: a scala-Int-valued java map
    // unboxes a missing key's null to 0, which would "expand" every unknown
    // entity to U+0000
    val m = new java.util.HashMap[String, java.lang.Integer](512)
    def put(pairs: (String, Int)*): Unit =
      pairs.foreach(p => m.put(p._1, Integer.valueOf(p._2)))
    // markup-significant + apos
    put("quot" -> 34, "amp" -> 38, "apos" -> 39, "lt" -> 60, "gt" -> 62)
    // Latin-1, code points 160..255 in order
    val latin1 = Array(
      "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
      "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
      "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
      "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
      "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
      "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
      "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
      "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
      "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
      "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
      "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
      "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")
    latin1.zipWithIndex.foreach { case (n, i) => m.put(n, 160 + i) }
    // Latin Extended / punctuation / spacing
    put("OElig" -> 338, "oelig" -> 339, "Scaron" -> 352, "scaron" -> 353,
      "Yuml" -> 376, "fnof" -> 402, "circ" -> 710, "tilde" -> 732,
      "ensp" -> 8194, "emsp" -> 8195, "thinsp" -> 8201, "zwnj" -> 8204,
      "zwj" -> 8205, "lrm" -> 8206, "rlm" -> 8207, "ndash" -> 8211,
      "mdash" -> 8212, "lsquo" -> 8216, "rsquo" -> 8217, "sbquo" -> 8218,
      "ldquo" -> 8220, "rdquo" -> 8221, "bdquo" -> 8222, "dagger" -> 8224,
      "Dagger" -> 8225, "bull" -> 8226, "hellip" -> 8230, "permil" -> 8240,
      "prime" -> 8242, "Prime" -> 8243, "lsaquo" -> 8249, "rsaquo" -> 8250,
      "oline" -> 8254, "frasl" -> 8260, "euro" -> 8364)
    // Greek
    val greekUpper = Array("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta",
      "Eta", "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi", "Omicron",
      "Pi", "Rho")
    greekUpper.zipWithIndex.foreach { case (n, i) => m.put(n, 913 + i) }
    val greekUpper2 = Array("Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")
    greekUpper2.zipWithIndex.foreach { case (n, i) => m.put(n, 931 + i) }
    val greekLower = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigmaf", "sigma", "tau", "upsilon", "phi", "chi", "psi",
      "omega")
    greekLower.zipWithIndex.foreach { case (n, i) => m.put(n, 945 + i) }
    put("thetasym" -> 977, "upsih" -> 978, "piv" -> 982)
    // letterlike, arrows, math, technical, shapes, suits
    put("weierp" -> 8472, "image" -> 8465, "real" -> 8476, "trade" -> 8482,
      "alefsym" -> 8501, "larr" -> 8592, "uarr" -> 8593, "rarr" -> 8594,
      "darr" -> 8595, "harr" -> 8596, "crarr" -> 8629, "lArr" -> 8656,
      "uArr" -> 8657, "rArr" -> 8658, "dArr" -> 8659, "hArr" -> 8660,
      "forall" -> 8704, "part" -> 8706, "exist" -> 8707, "empty" -> 8709,
      "nabla" -> 8711, "isin" -> 8712, "notin" -> 8713, "ni" -> 8715,
      "prod" -> 8719, "sum" -> 8721, "minus" -> 8722, "lowast" -> 8727,
      "radic" -> 8730, "prop" -> 8733, "infin" -> 8734, "ang" -> 8736,
      "and" -> 8743, "or" -> 8744, "cap" -> 8745, "cup" -> 8746,
      "int" -> 8747, "there4" -> 8756, "sim" -> 8764, "cong" -> 8773,
      "asymp" -> 8776, "ne" -> 8800, "equiv" -> 8801, "le" -> 8804,
      "ge" -> 8805, "sub" -> 8834, "sup" -> 8835, "nsub" -> 8836,
      "sube" -> 8838, "supe" -> 8839, "oplus" -> 8853, "otimes" -> 8855,
      "perp" -> 8869, "sdot" -> 8901, "lceil" -> 8968, "rceil" -> 8969,
      "lfloor" -> 8970, "rfloor" -> 8971, "lang" -> 9001, "rang" -> 9002,
      "loz" -> 9674, "spades" -> 9824, "clubs" -> 9827, "hearts" -> 9829,
      "diams" -> 9830)
    m
  }

  private final val Text = 0
  private final val InTag = 1
  private final val InCharRef = 2

  def normalize(s: String, opts: Options = Options()): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var state = Text
    var refStart = -1 // index of '&'
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var consumed = false
      state match {
        case InTag =>
          if (c == '>') { state = Text; consumed = true } // tag dropped whole
          else consumed = true // everything inside a tag is dropped
        case InCharRef =>
          if (c == ';') {
            val body = s.substring(refStart + 1, i)
            val expanded = expand(body)
            if (expanded != null) {
              out.append(expanded)
              state = Text
              refStart = -1
              consumed = true
            } else {
              // invalid reference: written back as-is INCLUDING ';',
              // without re-entering any state
              out.append(s, refStart, i + 1)
              state = Text
              refStart = -1
              consumed = true
            }
          } else if ((i - refStart == 1 && c == '#') ||
              (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
              (c >= '0' && c <= '9')) {
            consumed = true // accumulating
          } else if (opts.removeTag && c == '<') {
            // reference control flow: the IN_CHAR_REF case falls through
            // into the default state handler (normalizer.c:6293-6310), so
            // '<' DROPS the pending "&..." silently and opens a tag
            // ("a&b<c>d" -> "ad")
            state = InTag
            refStart = -1
            consumed = true
          } else if (opts.expandCharacterReference && c == '&') {
            // same fallthrough: '&' drops the pending ref and restarts one
            // at this character ("&&amp;" -> "&")
            refStart = i
            consumed = true
          } else {
            // any other non-name character: flush "&...X" literally, back
            // to TEXT. (Deliberate divergence: the reference's bottom
            // switch is ALSO missing a break here, so it writes the
            // terminating character a second time — "&bogus;" -> "&bogus;;"
            // — a fallthrough artifact no reference golden covers; we write
            // the literal run exactly once.)
            out.append(s, refStart, i + 1)
            state = Text
            refStart = -1
            consumed = true
          }
        case _ =>
          if (opts.removeTag && c == '<') { state = InTag; consumed = true }
          else if (opts.expandCharacterReference && c == '&') {
            state = InCharRef; refStart = i; consumed = true
          }
      }
      if (!consumed) out.append(c)
      i += 1
    }
    // unterminated tag AND unterminated char ref are both dropped at end of
    // input (the reference flushes neither into the normalized text)
    out.toString
  }

  /** expand a reference body (text between '&' and ';'); null = invalid */
  private def expand(body: String): String = {
    if (body.startsWith("#")) {
      val hex = body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
      val digits = if (hex) body.substring(2) else body.substring(1)
      var cp = 0L
      var i = 0
      while (i < digits.length) {
        val d = Character.digit(digits.charAt(i), if (hex) 16 else 10)
        if (d < 0) return null // stray non-digit → invalid, literal as-is
        cp = math.min(cp * (if (hex) 16 else 10) + d, 0x7FFFFFFFL)
        i += 1
      }
      // empty digit run parses as 0 → U+FFFD (grn_atoll/grn_text_code_point)
      new String(Character.toChars(remapNumeric(cp)))
    } else {
      val cp = named.get(body)
      if (cp == null) null else new String(Character.toChars(cp.intValue()))
    }
  }

  /** DataFrame op: html-normalize a text column (tags stripped + character
    * references expanded) — the web-corpus ingestion shape: html_untag plus
    * entity expansion in one distributed pass. */
  def normalizeColumn(docs: DataFrame, idCol: String, textCol: String,
      opts: Options = Options()): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(docs(idCol).cast("long"), docs(textCol).cast("string"))
      .mapPartitions { it =>
        it.map(r => (r.getLong(0), normalize(r.getString(1), opts)))
      }(enc)
      .toDF(idCol, "normalized")
  }
}
