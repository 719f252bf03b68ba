package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}

import graft.analyzer.{Analyzers, OffsetToken, Tokenizer}

/** Position-driven highlight + snippet.
  *
  * Unlike a regex markup, matching happens in NORMALIZED token space (the
  * same lexicon the index stores) and tags are inserted at the tokens'
  * source-char offsets — multi-term, normalization-aware (full-width,
  * case), with overlapping/adjacent matched grams merged into one tagged
  * run. Semantic counterpart of groonga's highlighter over the output text
  * (/root/reference/lib/highlighter.c; snippets lib/snip.c).
  */
object Highlighter {

  /** merged raw-char ranges of tokens whose term is in `terms` */
  def matchRanges(toks: Array[OffsetToken], terms: Set[String]): Array[(Int, Int)] = {
    val hits = toks.filter(t => terms.contains(t.term))
    if (hits.isEmpty) return Array.empty
    java.util.Arrays.sort(hits, (a: OffsetToken, b: OffsetToken) =>
      if (a.start != b.start) Integer.compare(a.start, b.start)
      else Integer.compare(a.end, b.end))
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var (cs, ce) = (hits(0).start, hits(0).end)
    var i = 1
    while (i < hits.length) {
      val h = hits(i)
      if (h.start <= ce) { if (h.end > ce) ce = h.end } // overlap/adjacent: merge
      else { out += ((cs, ce)); cs = h.start; ce = h.end }
      i += 1
    }
    out += ((cs, ce))
    out.toArray
  }

  /** tag every matched token run; None when nothing matches */
  def highlight(raw: String, tokenizer: Tokenizer, terms: Set[String],
      open: String = "<em>", close: String = "</em>"): Option[String] = {
    val rs = matchRanges(tokenizer.tokenizeWithOffsets(raw), terms)
    if (rs.isEmpty) return None
    val sb = new java.lang.StringBuilder(raw.length + rs.length * (open.length + close.length))
    var prev = 0
    rs.foreach { case (s, e) =>
      sb.append(raw, prev, s).append(open).append(raw, s, e).append(close)
      prev = e
    }
    sb.append(raw, prev, raw.length)
    Some(sb.toString)
  }

  /** context window of `width` chars starting `before` chars ahead of the
    * FIRST matched token; None when nothing matches */
  def snippet(raw: String, tokenizer: Tokenizer, terms: Set[String],
      before: Int = 15, width: Int = 40): Option[String] = {
    val rs = matchRanges(tokenizer.tokenizeWithOffsets(raw), terms)
    if (rs.isEmpty) return None
    val from = math.max(0, rs(0)._1 - before)
    Some(raw.substring(from, math.min(raw.length, from + width)))
  }

  /** snippet_html: up to `maxResults` windows of `width` chars, each
    * centered on a matched region with every contained match tagged
    * (reference defaults: width 200, max_n_results 3, span.keyword tags —
    * lib/proc/proc_snippet.c:448, grn_snip window placement lib/snip.c:
    * start = match_start - (width - match_len)/2, clamped). A match FULLY
    * covered by the previous window does not open a new one; a match
    * straddling the previous window's boundary does (so every occurrence
    * is tagged somewhere), which means adjacent windows may overlap by up
    * to the centering pad and a straddling match can appear tagged in
    * both. Empty when nothing matches. */
  def snippetsHtml(raw: String, tokenizer: Tokenizer, terms: Set[String],
      width: Int = 200, maxResults: Int = 3,
      open: String = "<span class=\"keyword\">",
      close: String = "</span>"): Seq[String] = {
    val rs = matchRanges(tokenizer.tokenizeWithOffsets(raw), terms)
    if (rs.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var covered = -1
    var i = 0
    while (i < rs.length && out.length < maxResults) {
      val (s, e) = rs(i)
      // a match opens a new window unless the PREVIOUS window fully covered
      // it — a range straddling the boundary (s < covered < e) must still
      // get a window, else that occurrence is never tagged anywhere
      if (e > covered) {
        val from = math.max(0, s - math.max(0, (width - (e - s)) / 2))
        val to = math.min(raw.length, from + width)
        val inside = rs.filter(r => r._1 >= from && r._2 <= to)
        val sb = new java.lang.StringBuilder(width + inside.length * (open.length + close.length))
        var prev = from
        inside.foreach { case (ms, me) =>
          sb.append(raw, prev, ms).append(open).append(raw, ms, me).append(close)
          prev = me
        }
        sb.append(raw, prev, to)
        out += sb.toString
        covered = to
      }
      i += 1
    }
    out.toSeq
  }

  /** highlight_full (reference proc at lib/proc/proc_highlight.c:271-411,
    * engine lib/highlighter.c): each keyword carries its OWN open/close tag
    * pair, matching runs in NORMALIZED space (NFKC + case fold, so "mysql"
    * tags "ＭｙＳＱＬ"), matched spans are emitted as the RAW slice inside
    * the keyword's tags, and — when `htmlEscape` — all text is escaped
    * with the reference's XML set (" < > &, lib/str.c grn_text_escape_xml).
    * Scanning is leftmost-longest over keyword occurrences (the role of
    * grn_pat_tag_keys' longest-prefix lookup), substring-level — no word
    * boundaries, unlike the token-space highlight(). */
  def highlightFull(raw: String, keywords: Seq[(String, String, String)],
      htmlEscape: Boolean): String = {
    val norm = graft.analyzer.Normalizer.normalizeWithOffsets(raw)
    val text = norm.text
    // normalize keywords identically; longest-first for the tie at one start
    val kws = keywords.map { case (kw, open, close) =>
      (graft.analyzer.Normalizer.normalize(kw).text, open, close)
    }.filter(_._1.nonEmpty).sortBy(-_._1.length)
    val sb = new java.lang.StringBuilder(raw.length + 32)
    def emit(from: Int, to: Int): Unit = {
      if (!htmlEscape) sb.append(raw, from, to)
      else {
        var i = from
        while (i < to) {
          raw.charAt(i) match {
            case '"' => sb.append("&quot;")
            case '<' => sb.append("&lt;")
            case '>' => sb.append("&gt;")
            case '&' => sb.append("&amp;")
            case c => sb.append(c)
          }
          i += 1
        }
      }
    }
    var j = 0 // position in normalized text
    var rawPrev = 0
    while (j < text.length) {
      var matched = false
      var k = 0
      while (!matched && k < kws.length) {
        val (kw, open, close) = kws(k)
        if (text.startsWith(kw, j)) {
          val rs = norm.srcStart(j)
          val re = norm.srcEnd(j + kw.length - 1)
          // a keyword fully inside one raw char's expansion can't be tagged
          // separately; require the span to advance
          if (re > rs && rs >= rawPrev) {
            emit(rawPrev, rs)
            sb.append(open)
            emit(rs, re)
            sb.append(close)
            rawPrev = re
            j += kw.length
            matched = true
          }
        }
        k += 1
      }
      if (!matched) j += 1
    }
    emit(rawPrev, raw.length)
    sb.toString
  }

  /** DataFrame op: (id, highlighted) with per-keyword tag sets */
  def highlightFullColumn(docs: DataFrame, idCol: String, textCol: String,
      keywords: Seq[(String, String, String)], htmlEscape: Boolean): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(docs(idCol).cast("long"), docs(textCol).cast("string"))
      .mapPartitions { it =>
        it.map(r => (r.getLong(0), highlightFull(r.getString(1), keywords, htmlEscape)))
      }(enc)
      .toDF(idCol, "highlighted")
  }

  /** DataFrame op: (id, snippets array) — reference snippet_html shape */
  def snippetsHtmlColumn(docs: DataFrame, idCol: String, textCol: String,
      tokenizerName: String, terms: Set[String],
      width: Int = 200, maxResults: Int = 3,
      open: String = "<span class=\"keyword\">",
      close: String = "</span>"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(docs(idCol).cast("long"), docs(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val tok = Analyzers.byName(tokenizerName)
        it.flatMap { case (id, text) =>
          val sn = snippetsHtml(text, tok, terms, width, maxResults, open, close)
          if (sn.isEmpty) None else Some((id, sn))
        }
      }
      .toDF(idCol, "snippets")
  }

  /** DataFrame op: (id, highlighted) for docs containing any query term */
  def highlightColumn(docs: DataFrame, idCol: String, textCol: String,
      tokenizerName: String, terms: Set[String],
      open: String = "<em>", close: String = "</em>"): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(docs(idCol).cast("long"), docs(textCol).cast("string"))
      .mapPartitions { it =>
        val tok = Analyzers.byName(tokenizerName)
        it.flatMap { r =>
          highlight(r.getString(1), tok, terms, open, close).map((r.getLong(0), _))
        }
      }(enc)
      .toDF(idCol, "highlighted")
  }

  /** DataFrame op: (id, snippet) around the first matched term */
  def snippetColumn(docs: DataFrame, idCol: String, textCol: String,
      tokenizerName: String, terms: Set[String],
      before: Int = 15, width: Int = 40): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(docs(idCol).cast("long"), docs(textCol).cast("string"))
      .mapPartitions { it =>
        val tok = Analyzers.byName(tokenizerName)
        it.flatMap { r =>
          snippet(r.getString(1), tok, terms, before, width).map((r.getLong(0), _))
        }
      }(enc)
      .toDF(idCol, "snippet")
  }
}
