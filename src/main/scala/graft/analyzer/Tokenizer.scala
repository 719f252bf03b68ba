package graft.analyzer

import scala.collection.mutable.ArrayBuffer

/** One token emitted by a tokenizer.
  *
  * @param term   normalized token text
  * @param pos    token position (phrase arithmetic: a query-side gram that
  *               consumed k source chars advances the counter by k, so query
  *               positions line up with index positions — semantic equivalent
  *               of groonga's skip accounting, /root/reference/lib/tokenizers.c:1130-1140)
  * @param status bit flags, see [[TokenStatus]]
  */
final case class Token(term: String, pos: Int, status: Int)

object TokenStatus {
  /** token overlaps the previous one (n-gram stride 1) */
  final val Overlap = 1
  /** token shorter than the configured n-gram size (end of run) */
  final val Unmatured = 2
  /** last token of the input */
  final val Last = 4
  /** query-side: unmatured tail should be prefix-expanded
    * (cf. force_prefix_search, /root/reference/lib/ii.cpp:11016-11017) */
  final val ForcePrefix = 8
}

/** Tokenizer mode: Add = indexing (emit every n-gram start, stride 1);
  * Get = query analysis (stride n, unmatured tail marks prefix search).
  * Mirrors groonga's GRN_TOKENIZE_ADD / GET
  * (/root/reference/lib/tokenizers.c:973-1158 skip logic).
  */
sealed trait TokenizeMode
object TokenizeMode {
  case object Add extends TokenizeMode
  case object Get extends TokenizeMode
}

/** A token with source-char offsets (highlight/snippet input): term at
  * normalized position `pos`, produced by raw chars [start, end). */
final case class OffsetToken(term: String, pos: Int, start: Int, end: Int)

trait Tokenizer extends Serializable {
  def name: String
  def tokenize(raw: String, mode: TokenizeMode): Array[Token]
  /** ADD-mode tokens with raw-string char offsets (for position-driven
    * highlight/snippet). Term/pos sequence MUST equal tokenize(raw). */
  def tokenizeWithOffsets(raw: String): Array[OffsetToken] =
    throw new UnsupportedOperationException(s"$name: offset tokenization not supported")
  final def tokenize(raw: String): Array[Token] = tokenize(raw, TokenizeMode.Add)
  /** Just the terms, Add mode — the common indexing path. */
  final def terms(raw: String): Array[String] = tokenize(raw).map(_.term)
  /** token count only (doc-length stats) — override for an allocation-free
    * path; must equal tokenize(raw).length */
  def countTokens(raw: String): Int = tokenize(raw).length
}

/** N-gram options, semantic counterpart of `grn_ngram_options`
  * (/root/reference/lib/tokenizers.c:452-463, defaults :493-507).
  * With all `unify*` on (TokenBigram defaults), contiguous runs of
  * alphabet/digit/symbol chars become single "word" tokens and only
  * n-gram-class scripts (CJK, …) are split into grams.
  */
final case class NgramOptions(
    n: Int = 2,
    unifyAlphabet: Boolean = true,
    unifyDigit: Boolean = true,
    unifySymbol: Boolean = true,
    ignoreBlank: Boolean = false,
    removeBlank: Boolean = true,
    /** loose modes (grn_ngram_options loose_symbol/loose_blank,
      * lib/tokenizers.c:508 ngram_switch_to_loose_mode): when the input
      * contains symbols/blanks, ADD mode emits a SECOND token stream of the
      * input with those chars removed, separated by the end-mark token ￰ —
      * "090-1234" indexes both ["090","-","1234"] and ["0901234"], so a
      * symbol-free query matches loosely. GET mode tokenizes the STRIPPED
      * query against the loose stream. */
    looseSymbol: Boolean = false,
    looseBlank: Boolean = false)

final class NgramTokenizer(val opts: NgramOptions, val name: String) extends Tokenizer {

  private def unified(cls: Byte): Boolean = cls match {
    case CharClass.Alpha => opts.unifyAlphabet
    case CharClass.Digit => opts.unifyDigit
    case CharClass.Symbol => opts.unifySymbol
    case _ => false
  }

  /** chars the loose stream removes */
  private def removable(c: Byte): Boolean =
    (opts.looseSymbol && c == CharClass.Symbol) ||
      (opts.looseBlank && c == CharClass.Blank)

  def tokenize(raw: String, mode: TokenizeMode): Array[Token] = {
    val norm = Normalizer.normalize(raw)
    val looseActive = (opts.looseSymbol || opts.looseBlank) &&
      norm.classes.exists(removable)
    if (!looseActive) return walk(norm.text, norm.classes, mode, 0)
    // loose mode: strip the removable chars for the secondary stream
    val sb = new java.lang.StringBuilder(norm.text.length)
    val cb = new ArrayBuffer[Byte](norm.text.length)
    var k = 0
    while (k < norm.text.length) {
      if (!removable(norm.classes(k))) { sb.append(norm.text.charAt(k)); cb += norm.classes(k) }
      k += 1
    }
    val (strippedText, strippedCls) = (sb.toString, cb.toArray)
    mode match {
      case TokenizeMode.Get =>
        // queries search the loose stream (the stripped form)
        walk(strippedText, strippedCls, mode, 0)
      case TokenizeMode.Add =>
        val primary = walk(norm.text, norm.classes, mode, 0)
        val out = new ArrayBuffer[Token](primary.length * 2 + 1)
        out ++= primary
        val sepPos = primary.lastOption.map(_.pos + 1).getOrElse(0)
        out += Token("￰", sepPos, 0) // end-mark separator (reference ￰)
        out ++= walk(strippedText, strippedCls, mode, sepPos + 1)
        out.toArray
    }
  }

  private def walk(text: String, cls: Array[Byte], mode: TokenizeMode,
      posStart: Int): Array[Token] = {
    val out = new ArrayBuffer[Token](math.max(8, text.length / 4))
    var pos = posStart
    var i = 0
    val len = text.length
    while (i < len) {
      val c = cls(i)
      if (c == CharClass.Blank) {
        i += 1 // blanks emit nothing; with ignoreBlank they are fully invisible
      } else if (unified(c)) {
        // whole same-class run -> one word token
        var j = i + 1
        while (j < len && cls(j) == c) j += 1
        // with ignoreBlank, a blank-separated run of the same class unifies too
        if (opts.ignoreBlank) {
          var k = j
          while (k < len && (cls(k) == CharClass.Blank || cls(k) == c)) k += 1
          if (k > j && cls(k - 1) == c) j = k
        }
        val term =
          if (opts.ignoreBlank) text.substring(i, j).filterNot(ch => Character.isWhitespace(ch))
          else text.substring(i, j)
        out += Token(term, pos, 0)
        pos += 1
        i = j
      } else {
        // n-gram run over contiguous non-unified chars (same "gram region":
        // any class that is not blank and not unified)
        var runEnd = i
        while (runEnd < len && cls(runEnd) != CharClass.Blank && !unified(cls(runEnd))) runEnd += 1
        var s = i
        while (s < runEnd) {
          val glen = math.min(opts.n, runEnd - s)
          var status = 0
          if (s > i && mode == TokenizeMode.Add) status |= TokenStatus.Overlap
          if (glen < opts.n) {
            status |= TokenStatus.Unmatured
            if (mode == TokenizeMode.Get) status |= TokenStatus.ForcePrefix
          }
          out += Token(text.substring(s, s + glen), pos, status)
          mode match {
            case TokenizeMode.Add =>
              s += 1; pos += 1 // stride 1: every char start is a position
            case TokenizeMode.Get =>
              s += glen; pos += glen // stride n, but positions advance per char
          }
        }
        i = runEnd
      }
    }
    if (out.nonEmpty) {
      val last = out(out.length - 1)
      out(out.length - 1) = last.copy(status = last.status | TokenStatus.Last)
    }
    out.toArray
  }

  /** ADD-mode tokenize carrying raw-char offsets — same walk as tokenize()
    * over the offset-tracking normalizer (TokenizerSpec asserts the
    * term/pos sequences stay identical), INCLUDING the loose secondary
    * stream: its chars keep their source offsets through the strip, so
    * highlight/snippet over a loose-mode index can map loose-stream hits
    * back to raw char ranges. */
  override def tokenizeWithOffsets(raw: String): Array[OffsetToken] = {
    val norm = Normalizer.normalizeWithOffsets(raw)
    val primary = walkOffsets(norm.text, norm.classes, norm.srcStart, norm.srcEnd, 0)
    val looseActive = (opts.looseSymbol || opts.looseBlank) &&
      norm.classes.exists(removable)
    if (!looseActive) return primary
    val n = norm.text.length
    val sb = new java.lang.StringBuilder(n)
    val cb = new ArrayBuffer[Byte](n)
    val ss = new graft.codec.IntVec(n)
    val se = new graft.codec.IntVec(n)
    var k = 0
    while (k < n) {
      if (!removable(norm.classes(k))) {
        sb.append(norm.text.charAt(k)); cb += norm.classes(k)
        ss += norm.srcStart(k); se += norm.srcEnd(k)
      }
      k += 1
    }
    val sepPos = primary.lastOption.map(_.pos + 1).getOrElse(0)
    val out = new ArrayBuffer[OffsetToken](primary.length * 2 + 1)
    out ++= primary
    out += OffsetToken("￰", sepPos, 0, 0) // separator spans no source chars
    out ++= walkOffsets(sb.toString, cb.toArray, ss.toArray, se.toArray, sepPos + 1)
    out.toArray
  }

  private def walkOffsets(text: String, cls: Array[Byte],
      srcStart: Array[Int], srcEnd: Array[Int], posStart: Int): Array[OffsetToken] = {
    val out = new ArrayBuffer[OffsetToken](math.max(8, text.length / 4))
    var pos = posStart
    var i = 0
    val len = text.length
    while (i < len) {
      val c = cls(i)
      if (c == CharClass.Blank) {
        i += 1
      } else if (unified(c)) {
        var j = i + 1
        while (j < len && cls(j) == c) j += 1
        if (opts.ignoreBlank) {
          var k = j
          while (k < len && (cls(k) == CharClass.Blank || cls(k) == c)) k += 1
          if (k > j && cls(k - 1) == c) j = k
        }
        val term =
          if (opts.ignoreBlank) text.substring(i, j).filterNot(ch => Character.isWhitespace(ch))
          else text.substring(i, j)
        out += OffsetToken(term, pos, srcStart(i), srcEnd(j - 1))
        pos += 1
        i = j
      } else {
        var runEnd = i
        while (runEnd < len && cls(runEnd) != CharClass.Blank && !unified(cls(runEnd))) runEnd += 1
        var s = i
        while (s < runEnd) {
          val glen = math.min(opts.n, runEnd - s)
          out += OffsetToken(text.substring(s, s + glen), pos,
            srcStart(s), srcEnd(s + glen - 1))
          s += 1; pos += 1 // ADD mode: stride 1
        }
        i = runEnd
      }
    }
    out.toArray
  }

  /** allocation-free ADD-mode token count (doc-length stats pass) */
  override def countTokens(raw: String): Int = {
    val norm = Normalizer.normalize(raw)
    if ((opts.looseSymbol || opts.looseBlank) && norm.classes.exists(removable))
      return tokenize(raw).length // loose streams: exact but slower path
    val text = norm.text
    val cls = norm.classes
    var n = 0
    var i = 0
    val len = text.length
    while (i < len) {
      val c = cls(i)
      if (c == CharClass.Blank) i += 1
      else if (unified(c)) {
        var j = i + 1
        while (j < len && cls(j) == c) j += 1
        if (opts.ignoreBlank) {
          var k = j
          while (k < len && (cls(k) == CharClass.Blank || cls(k) == c)) k += 1
          if (k > j && cls(k - 1) == c) j = k
        }
        n += 1
        i = j
      } else {
        var runEnd = i
        while (runEnd < len && cls(runEnd) != CharClass.Blank && !unified(cls(runEnd))) runEnd += 1
        n += runEnd - i // stride-1 grams: one token per char start
        i = runEnd
      }
    }
    n
  }
}

/** Delimiter tokenizer — TokenDelimit (whitespace) and TokenDelimitNull
  * (NUL-separated input, e.g. pre-tokenized feeds)
  * (/root/reference/lib/tokenizers.c:200-446, registration :3111, :3119). */
final class DelimitTokenizer(val name: String = "TokenDelimit",
    delimiter: String = "\\s+") extends Tokenizer {
  def tokenize(raw: String, mode: TokenizeMode): Array[Token] = {
    val norm = Normalizer.normalize(raw)
    val parts = norm.text.split(delimiter).filter(_.nonEmpty)
    val out = parts.zipWithIndex.map { case (t, i) => Token(t, i, 0) }
    if (out.nonEmpty) out(out.length - 1) = out(out.length - 1)
      .copy(status = TokenStatus.Last)
    out
  }
}

/** Regexp-pattern extraction tokenizer — TokenPattern
  * (/root/reference/lib/tokenizers.c registration :3196). */
final class PatternTokenizer(pattern: String) extends Tokenizer {
  val name = "TokenPattern"
  @transient private lazy val rx = pattern.r
  def tokenize(raw: String, mode: TokenizeMode): Array[Token] = {
    val norm = Normalizer.normalize(raw)
    val out = rx.findAllIn(norm.text).toArray.zipWithIndex
      .map { case (t, i) => Token(t, i, 0) }
    if (out.nonEmpty) out(out.length - 1) = out(out.length - 1)
      .copy(status = TokenStatus.Last)
    out
  }
}

/** TokenRegexp — the gram stream the reference's INDEXED regexp search
  * rides (/root/reference/lib/tokenizers.c:1289-1545).
  *
  * ADD mode brackets the text with begin/end marks (U+FFEF / U+FFF0) and
  * emits stride-1 bigrams that never cross a blank; every blank gap
  * consumes ONE position (the reference's empty SKIP token,
  * tokenizers.c:1409-1415), so `\A`-/`\z`-anchored literals can be matched
  * as mark-bracketed phrases against the grams.
  *
  * GET mode re-anchors marks embedded in the query string, strides bigrams
  * with the n_skip_tokens pattern (tokenizers.c:1505-1530), bypasses the
  * stride at blank breaks / end-mark breaks / input end, and hides
  * unmatured overlapped grams exactly like the token cursor does
  * (/root/reference/lib/token_cursor.c:497-502) — blanks consume NO
  * position on the query side. Token/position streams reproduce the
  * reference goldens (test/command/suite/tokenizers/regexp) byte-for-byte
  * (TokenRegexpSpec transcribes all of them). */
final class TokenRegexpTokenizer extends Tokenizer {
  import TokenRegexpTokenizer._
  val name = "TokenRegexp"

  def tokenize(raw: String, mode: TokenizeMode): Array[Token] = mode match {
    case TokenizeMode.Add => add(raw)
    case TokenizeMode.Get => get(raw)
  }

  /** maximal blank-free [start, end) runs of the normalized text */
  private def runsOf(text: String, cls: Array[Byte]): Seq[(Int, Int)] = {
    val runs = new ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < text.length) {
      if (cls(i) == CharClass.Blank) i += 1
      else {
        var j = i
        while (j < text.length && cls(j) != CharClass.Blank) j += 1
        runs += ((i, j))
        i = j
      }
    }
    runs.toSeq
  }

  private def add(raw: String): Array[Token] = {
    val norm = Normalizer.normalize(raw)
    val text = norm.text
    val out = new ArrayBuffer[Token](text.length + 3)
    out += Token(BeginMark, 0, 0)
    var pos = 1
    var first = true
    runsOf(text, norm.classes).foreach { case (a, b) =>
      if (!first) pos += 1 // the gap's empty SKIP token consumes a position
      first = false
      var s = a
      while (s < b) {
        val e = math.min(s + 2, b)
        var st = 0
        if (s > a) st |= TokenStatus.Overlap
        if (e - s < 2) st |= TokenStatus.Unmatured
        out += Token(text.substring(s, e), pos, st)
        pos += 1
        s += 1
      }
    }
    out += Token(EndMark, pos, TokenStatus.Last)
    out.toArray
  }

  private def get(raw: String): Array[Token] = {
    val hasBegin = raw.startsWith(BeginMark)
    val from = if (hasBegin) 1 else 0
    val hasEnd = raw.length > from && raw.endsWith(EndMark)
    val body = raw.substring(from, raw.length - (if (hasEnd) 1 else 0))
    val norm = Normalizer.normalize(body)
    val text = norm.text
    val out = new ArrayBuffer[Token](text.length / 2 + 3)
    var pos = 0
    if (hasBegin) {
      out += Token(BeginMark, 0,
        if (text.isEmpty && !hasEnd) TokenStatus.Last else 0)
      pos = 1
    }
    val runs = runsOf(text, norm.classes)
    var skip = 0
    var isStart = true // reference inits is_start_token = true
    var prevLen = 0 // drives the cursor's overlap-hide rule
    var ri = 0
    while (ri < runs.length) {
      val (a, b) = runs(ri)
      val lastRun = ri == runs.length - 1
      var s = a
      while (s < b) {
        val e = math.min(s + 2, b)
        val glen = e - s
        val atTextEnd = e == b && lastRun
        val overlap = prevLen > 1
        val unmatured = glen < 2
        val startTok = isStart
        isStart = false
        var emit = false
        var status = 0
        if (overlap) status |= TokenStatus.Overlap
        if (unmatured) status |= TokenStatus.Unmatured
        if (atTextEnd && !hasEnd) {
          // current == end: emitted regardless of the stride counter
          status |= TokenStatus.Last
          if (unmatured) status |= TokenStatus.ForcePrefix
          emit = true
        } else if (e == b && !atTextEnd) {
          // break_by_blank: emitted, stride reset, next token is a start
          skip = 0; isStart = true; emit = true
        } else if (atTextEnd && hasEnd) {
          // break_by_end_mark: unmatured non-start grams are skipped
          emit = startTok || !unmatured
        } else if (skip > 0) {
          skip -= 1 // n_skip_tokens: stride-interior gram, hidden
        } else {
          skip = 1; emit = true
        }
        // token-cursor GET rule: unmatured overlapped grams are hidden
        // (they still consume their position)
        if (unmatured && overlap) emit = false
        if (emit) out += Token(text.substring(s, e), pos, status)
        prevLen = glen
        pos += 1
        s += 1
      }
      ri += 1 // query-side blanks consume no position
    }
    if (hasEnd) out += Token(EndMark, pos, TokenStatus.Last)
    out.toArray
  }
}

object TokenRegexpTokenizer {
  /** GRN_TOKENIZER_BEGIN_MARK_UTF8 / END_MARK_UTF8 (U+FFEF / U+FFF0) */
  final val BeginMark = "￯"
  final val EndMark = "￰"
}

/** TokenTable — tokenize by GREEDY LONGEST MATCH against a fixed lexicon
  * key set; unmatched chars are skipped
  * (/root/reference/lib/tokenizers.c registration :3203). */
final class TableTokenizer(keys: Set[String], val name: String = "TokenTable")
    extends Tokenizer {
  private val maxLen = if (keys.isEmpty) 0 else keys.iterator.map(_.length).max
  def tokenize(raw: String, mode: TokenizeMode): Array[Token] = {
    val text = Normalizer.normalize(raw).text
    val out = new ArrayBuffer[Token]()
    var i = 0
    var pos = 0
    while (i < text.length) {
      var found: String = null
      var l = math.min(maxLen, text.length - i)
      while (found == null && l >= 1) {
        val cand = text.substring(i, i + l)
        if (keys.contains(cand)) found = cand
        l -= 1
      }
      if (found != null) {
        out += Token(found, pos, 0)
        pos += 1
        i += found.length
      } else i += 1
    }
    if (out.nonEmpty) out(out.length - 1) =
      out(out.length - 1).copy(status = out(out.length - 1).status | TokenStatus.Last)
    out.toArray
  }
}

/** A token-stream transform applied after tokenization, index- AND
  * query-side (consistency comes from persisting the full analyzer spec in
  * the index manifest). Mirrors groonga's token_filters
  * (/root/reference/plugins/token_filters/stop_word.c, stem.c). */
trait TokenFilter extends Serializable {
  def name: String
  /** map a term to its filtered form, or null to DROP the token.
    * Positions of surviving tokens are NOT renumbered (groonga keeps the
    * original positions when stop words are skipped). */
  def apply(term: String): String
}

final class StopWordFilter(stop: Set[String]) extends TokenFilter {
  val name = s"TokenFilterStopWord(${stop.toSeq.sorted.mkString(",")})"
  def apply(term: String): String = if (stop.contains(term)) null else term
}

final class StemFilter extends TokenFilter {
  val name = "TokenFilterStem"
  def apply(term: String): String = PorterStemmer.stem(term)
}

final class SStemFilter extends TokenFilter {
  val name = "TokenFilterStemS"
  def apply(term: String): String = SStemmer.stem(term)
}

/** unify_kana (a NormalizerNFKC option in the reference,
  * lib/normalizer.c options parsing): fold katakana to hiragana so both
  * scripts match. Char classes are identical for both scripts, so applying
  * it as a token filter yields the same gram stream as normalizing first. */
final class UnifyKanaFilter extends TokenFilter {
  val name = "TokenFilterUnifyKana"
  def apply(term: String): String = {
    var changed = false
    val out = new Array[Char](term.length)
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      // katakana ァ(30A1)..ヶ(30F6) -> hiragana ぁ(3041)..ゖ(3096)
      if (c >= 'ァ' && c <= 'ヶ') { out(i) = (c - 0x60).toChar; changed = true }
      else out(i) = c
      i += 1
    }
    if (changed) new String(out) else term
  }
}

/** base tokenizer + ordered filter chain; the composed `name` is the full
  * spec ("TokenBigram+TokenFilterStem+TokenFilterStopWord(a,the)") and
  * round-trips through Analyzers.byName — what the manifest stores. */
final class FilteredTokenizer(base: Tokenizer, filters: Seq[TokenFilter]) extends Tokenizer {
  val name: String = (base.name +: filters.map(_.name)).mkString("+")

  def tokenize(raw: String, mode: TokenizeMode): Array[Token] = {
    val toks = base.tokenize(raw, mode)
    val out = new ArrayBuffer[Token](toks.length)
    var i = 0
    while (i < toks.length) {
      var t = toks(i).term
      var j = 0
      while (t != null && j < filters.length) { t = filters(j)(t); j += 1 }
      if (t != null && t.nonEmpty) {
        out += (if (t eq toks(i).term) toks(i) else toks(i).copy(term = t))
      }
      i += 1
    }
    out.toArray
  }

  override def tokenizeWithOffsets(raw: String): Array[OffsetToken] = {
    val toks = base.tokenizeWithOffsets(raw)
    val out = new ArrayBuffer[OffsetToken](toks.length)
    var i = 0
    while (i < toks.length) {
      var t = toks(i).term
      var j = 0
      while (t != null && j < filters.length) { t = filters(j)(t); j += 1 }
      if (t != null && t.nonEmpty) {
        out += (if (t eq toks(i).term) toks(i) else toks(i).copy(term = t))
      }
      i += 1
    }
    out.toArray
  }

  override def countTokens(raw: String): Int = tokenize(raw).length
}

/** Tokenizer wrapped with a configured NormalizerNFKC pre-pass (the
  * reference's per-index normalizer options: `unify_kana` etc. applied
  * before tokenization). The spec round-trips through the manifest as
  * "Base@Nfkc(opt=true,...)". The tokenizer's own NFKC+fold re-run is
  * idempotent on the pre-normalized text. */
final class PreNormalizedTokenizer(base: Tokenizer, optSpec: String) extends Tokenizer {
  val name: String = s"${base.name}@Nfkc($optSpec)"
  private val opts = NfkcOptions.parse(optSpec)
  def tokenize(raw: String, mode: TokenizeMode): Array[Token] =
    base.tokenize(NfkcNormalizer.normalize(raw, opts), mode)
  override def countTokens(raw: String): Int =
    base.countTokens(NfkcNormalizer.normalize(raw, opts))
  // offsets refer to the pre-normalized string, not the raw input: fail fast
  // rather than hand highlight/snippet silently wrong char ranges
  override def tokenizeWithOffsets(raw: String): Array[OffsetToken] =
    throw new UnsupportedOperationException(
      s"$name: offset tokenization through an option-normalizer is not supported")
}

/** Tokenizer over RAW HTML: NormalizerHTML extraction (tag strip +
  * character-reference expansion) runs before the base analyzer, so an
  * index can be built directly over an html column. Offsets would refer
  * to the extracted text, not the raw html — fail fast like the Nfkc
  * pre-pass. */
final class HtmlPreTokenizer(base: Tokenizer) extends Tokenizer {
  val name: String = s"${base.name}@Html"
  def tokenize(raw: String, mode: TokenizeMode): Array[Token] =
    base.tokenize(HtmlNormalizer.normalize(raw), mode)
  override def countTokens(raw: String): Int =
    base.countTokens(HtmlNormalizer.normalize(raw))
  override def tokenizeWithOffsets(raw: String): Array[OffsetToken] =
    throw new UnsupportedOperationException(
      s"$name: offset tokenization through the HTML normalizer is not supported")
}

object Analyzers {
  val bigram = new NgramTokenizer(NgramOptions(n = 2), "TokenBigram")
  val unigram = new NgramTokenizer(NgramOptions(n = 1), "TokenUnigram")
  val trigram = new NgramTokenizer(NgramOptions(n = 3), "TokenTrigram")
  val bigramSplitSymbol = new NgramTokenizer(
    NgramOptions(n = 2, unifySymbol = false), "TokenBigramSplitSymbol")
  val bigramSplitSymbolAlpha = new NgramTokenizer(
    NgramOptions(n = 2, unifySymbol = false, unifyAlphabet = false),
    "TokenBigramSplitSymbolAlpha")
  val bigramSplitSymbolAlphaDigit = new NgramTokenizer(
    NgramOptions(n = 2, unifySymbol = false, unifyAlphabet = false, unifyDigit = false),
    "TokenBigramSplitSymbolAlphaDigit")
  val bigramIgnoreBlank = new NgramTokenizer(
    NgramOptions(n = 2, ignoreBlank = true), "TokenBigramIgnoreBlank")
  val delimit = new DelimitTokenizer
  val delimitNull = new DelimitTokenizer("TokenDelimitNull", "\u0000+")
  val regexp = new TokenRegexpTokenizer

  private def filterByName(spec: String): TokenFilter = {
    val p = spec.indexOf('(')
    val (base, args) =
      if (p < 0) (spec, "")
      else {
        require(spec.endsWith(")"), s"malformed filter spec: $spec")
        (spec.take(p), spec.substring(p + 1, spec.length - 1))
      }
    base match {
      case "TokenFilterStopWord" =>
        new StopWordFilter(args.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      case "TokenFilterStem" => new StemFilter
      case "TokenFilterStemS" => new SStemFilter
      case "TokenFilterUnifyKana" => new UnifyKanaFilter
      case other => throw new IllegalArgumentException(s"unknown token filter: $other")
    }
  }

  /** resolve "Base+Filter1+Filter2(...)" analyzer specs; '+' never occurs
    * inside filter args, so a top-level split is safe */
  def byName(name: String): Tokenizer = {
    if (name.contains('+')) {
      val parts = name.split('+')
      return new FilteredTokenizer(byName(parts.head), parts.tail.toSeq.map(filterByName))
    }
    byBaseName(name)
  }

  private def byBaseName(name: String): Tokenizer = name match {
    case spec if spec.contains("@Nfkc(") =>
      val at = spec.indexOf("@Nfkc(")
      require(spec.endsWith(")"), s"malformed normalizer spec: $spec")
      new PreNormalizedTokenizer(byBaseName(spec.take(at)),
        spec.substring(at + 6, spec.length - 1))
    case spec if spec.endsWith("@Html") =>
      // NormalizerHTML pre-pass: index raw HTML columns directly
      // ("TokenBigram@Html" analyzes the EXTRACTED text — tags stripped,
      // character references expanded — and round-trips through the
      // manifest like every analyzer spec)
      new HtmlPreTokenizer(byBaseName(spec.dropRight(5)))
    case "TokenBigram" => bigram
    case "TokenUnigram" => unigram
    case "TokenTrigram" => trigram
    case "TokenBigramSplitSymbol" => bigramSplitSymbol
    case "TokenBigramSplitSymbolAlpha" => bigramSplitSymbolAlpha
    case "TokenBigramSplitSymbolAlphaDigit" => bigramSplitSymbolAlphaDigit
    case "TokenBigramIgnoreBlank" => bigramIgnoreBlank
    case "TokenDelimit" => delimit
    case "TokenDelimitNull" => delimitNull
    case "TokenRegexp" => regexp
    case other if other.startsWith("TokenNgram:") =>
      // option surface of grn_ngram_options
      // (/root/reference/lib/tokenizers.c:452-463): either a bare gram size
      // ("TokenNgram:3") or comma-separated k=v options
      // ("TokenNgram:n=3,unify_alphabet=false,ignore_blank=true")
      val spec = other.stripPrefix("TokenNgram:")
      val opts =
        if (spec.forall(_.isDigit)) NgramOptions(n = spec.toInt)
        else spec.split(',').foldLeft(NgramOptions()) { (o, kv) =>
          kv.split("=", 2) match {
            case Array("n", v) => o.copy(n = v.toInt)
            case Array("unify_alphabet", v) => o.copy(unifyAlphabet = v.toBoolean)
            case Array("unify_digit", v) => o.copy(unifyDigit = v.toBoolean)
            case Array("unify_symbol", v) => o.copy(unifySymbol = v.toBoolean)
            case Array("ignore_blank", v) => o.copy(ignoreBlank = v.toBoolean)
            case Array("remove_blank", v) => o.copy(removeBlank = v.toBoolean)
            case Array("loose_symbol", v) => o.copy(looseSymbol = v.toBoolean)
            case Array("loose_blank", v) => o.copy(looseBlank = v.toBoolean)
            case _ => throw new IllegalArgumentException(s"bad TokenNgram option: $kv")
          }
        }
      new NgramTokenizer(opts, other)
    case other => throw new IllegalArgumentException(s"unknown tokenizer: $other")
  }
}

/** Token filters — search-time / index-time token stream transforms
  * (stop words: /root/reference/plugins/token_filters/stop_word.c). */
object TokenFilters {
  def stopWords(stop: Set[String])(tokens: Array[Token]): Array[Token] =
    tokens.filterNot(t => stop.contains(t.term))
}
