package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analyzer.Analyzers
import graft.operators.Highlighter

class HighlightSpec extends AnyFunSuite {
  private val bigram = Analyzers.bigram

  test("tokenizeWithOffsets term/pos sequence equals tokenize") {
    val inputs = Seq(
      "spark join merge",
      "Full-Width Ｓｐａｒｋ and CJK データベース検索",
      "日本語テキストの全文検索エンジン",
      "mixed 123 abc漢字def 456",
      "  leading blanks\tand\nnewlines  ")
    for (in <- inputs) {
      val plain = bigram.tokenize(in).map(t => (t.term, t.pos)).toSeq
      val off = bigram.tokenizeWithOffsets(in).map(t => (t.term, t.pos)).toSeq
      assert(off == plain, s"input: $in")
    }
  }

  test("offsets map into the raw string (identity corpus)") {
    val raw = "spark join merge"
    for (t <- bigram.tokenizeWithOffsets(raw))
      assert(raw.substring(t.start, t.end) == t.term)
  }

  test("offsets stay correct under length-changing normalization (full-width)") {
    val raw = "see Ｓｐａｒｋ here" // full-width Spark: 5 raw chars -> "spark"
    val toks = bigram.tokenizeWithOffsets(raw)
    val hit = toks.find(_.term == "spark").get
    assert(raw.substring(hit.start, hit.end) == "Ｓｐａｒｋ")
    val h = Highlighter.highlight(raw, bigram, Set("spark")).get
    assert(h == "see <em>Ｓｐａｒｋ</em> here")
  }

  test("multi-term highlight tags each occurrence") {
    val h = Highlighter.highlight(
      "the spark and join and spark again", bigram, Set("spark", "join")).get
    assert(h == "the <em>spark</em> and <em>join</em> and <em>spark</em> again")
  }

  test("no match yields None (not an untouched string)") {
    assert(Highlighter.highlight("nothing here", bigram, Set("spark")).isEmpty)
  }

  test("overlapping CJK grams merge into one tagged run") {
    // ADD-mode grams of データ are デー + ータ (overlap at ー); both match
    // inside データベース and must merge to one <em>データ</em>
    val h = Highlighter.highlight("データベース", bigram, Set("デー", "ータ")).get
    assert(h == "<em>データ</em>ベース")
  }

  test("substring token does NOT match (token-space, not regex-space)") {
    // 'spar' is not a token of "sparkle" (word tokens are whole runs)
    assert(Highlighter.highlight("sparkle plug", bigram, Set("spar")).isEmpty)
  }

  test("snippet windows around the first matched token") {
    val raw = "aaa bbb ccc spark ddd eee fff ggg hhh iii jjj"
    val s = Highlighter.snippet(raw, bigram, Set("spark"), before = 4, width = 12).get
    assert(s == raw.substring(8, 20))
    assert(s.contains("spark"))
    // match at string head: window clamps to 0
    val s2 = Highlighter.snippet("spark tail words", bigram, Set("spark"),
      before = 10, width = 8).get
    assert(s2 == "spark ta")
  }

  test("snippetsHtml: centered tagged windows, non-overlapping, capped") {
    val T = "<span class=\"keyword\">"; val C = "</span>"
    // one match dead center: window centered on it
    val raw = "aaaa bbbb kw cccc dddd"
    val sn = Highlighter.snippetsHtml(raw, bigram, Set("kw"), width = 10, maxResults = 3)
    //  start = 10 - (10-2)/2 = 6 -> raw(6,16) = "bbb kw ccc"
    assert(sn == Seq(s"bbb ${T}kw$C ccc"))
    // two far-apart matches -> two windows; both keywords tagged
    val raw2 = "kw xxxx yyyy zzzz wwww kw tail"
    val sn2 = Highlighter.snippetsHtml(raw2, bigram, Set("kw"), width = 8, maxResults = 3)
    assert(sn2.length == 2)
    assert(sn2.forall(_.contains(s"${T}kw$C")))
    // second match inside the first window does NOT open a new window,
    // but IS tagged inside the first
    val raw3 = "kw kw far far far far far far"
    val sn3 = Highlighter.snippetsHtml(raw3, bigram, Set("kw"), width = 12, maxResults = 3)
    assert(sn3.length == 1)
    assert(sn3.head == s"${T}kw$C ${T}kw$C far fa")
    // maxResults caps
    val raw4 = (0 until 10).map(i => s"kw p$i q$i r$i s$i t$i").mkString(" ")
    assert(Highlighter.snippetsHtml(raw4, bigram, Set("kw"), width = 6, maxResults = 3).length == 3)
    // no match -> empty
    assert(Highlighter.snippetsHtml("nothing here", bigram, Set("kw")).isEmpty)
  }

  test("highlight_full matches the reference two_keywords goldens") {
    // transcribed from test/command/suite/select/function/highlight_full/
    // two_keywords.expected and not_use_html_escape.expected
    val raw = "Mroonga is a ＭｙＳＱＬ storage engine based on Groonga. " +
      "<b>Rroonga</b> is a Ruby binding of Groonga."
    val kws = Seq(
      ("Groonga", "<span class=\"keyword1\">", "</span>"),
      ("mysql", "<span class=\"keyword2\">", "</span>"))
    assert(Highlighter.highlightFull(raw, kws, htmlEscape = true) ==
      "Mroonga is a <span class=\"keyword2\">ＭｙＳＱＬ</span> storage engine " +
      "based on <span class=\"keyword1\">Groonga</span>. &lt;b&gt;Rroonga&lt;/b&gt; " +
      "is a Ruby binding of <span class=\"keyword1\">Groonga</span>.")
    assert(Highlighter.highlightFull(raw, kws, htmlEscape = false) ==
      "Mroonga is a <span class=\"keyword2\">ＭｙＳＱＬ</span> storage engine " +
      "based on <span class=\"keyword1\">Groonga</span>. <b>Rroonga</b> " +
      "is a Ruby binding of <span class=\"keyword1\">Groonga</span>.")
    // leftmost-longest: overlapping keywords pick the longer at each start
    val lw = Highlighter.highlightFull("abcd",
      Seq(("ab", "[", "]"), ("abc", "(", ")")), htmlEscape = false)
    assert(lw == "(abc)d")
  }

  test("snippetsHtml: boundary-straddling match still gets a window") {
    val T = "<span class=\"keyword\">"; val C = "</span>"
    // window 1 = [0,7) covers "kw aa k" — the second kw at [6,8) straddles
    // the boundary: it is neither inside window 1 nor (formerly) allowed to
    // open window 2, so the occurrence was never tagged anywhere
    val raw = "kw aa kw bb"
    val sn = Highlighter.snippetsHtml(raw, bigram, Set("kw"), width = 7, maxResults = 3)
    assert(sn.length == 2, sn)
    assert(sn(0) == s"${T}kw$C aa k")
    assert(sn(1) == s"a ${T}kw$C bb")
  }
}
