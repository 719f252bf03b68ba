package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analyzer._

class AnalyzerSpec extends AnyFunSuite {

  test("normalizer: NFKC + case fold") {
    assert(Normalizer.normalize("ＡｂＣ").text == "abc") // full-width -> ascii
    assert(Normalizer.normalize("HELLO World").text == "hello world")
    assert(Normalizer.normalize("①②").text == "12") // compatibility digits
    assert(Normalizer.normalize("ﬁsh").text == "fish") // ligature
    assert(Normalizer.normalize("").text == "")
  }

  test("normalizer: char classes") {
    val n = Normalizer.normalize("ab1 .日")
    assert(n.classes.toSeq == Seq(
      CharClass.Alpha, CharClass.Alpha, CharClass.Digit, CharClass.Blank,
      CharClass.Symbol, CharClass.Other))
  }

  test("bigram: unified alpha run is one word token") {
    val toks = Analyzers.bigram.tokenize("spark search")
    assert(toks.map(_.term).toSeq == Seq("spark", "search"))
    assert(toks.map(_.pos).toSeq == Seq(0, 1))
    assert((toks.last.status & TokenStatus.Last) != 0)
  }

  test("bigram: CJK run emits overlapping grams + unmatured tail (ADD mode)") {
    // reference behavior: every char start emits a gram, tail shorter than n
    // (ngram_next, /root/reference/lib/tokenizers.c:973-1158)
    val toks = Analyzers.bigram.tokenize("日本語")
    assert(toks.map(_.term).toSeq == Seq("日本", "本語", "語"))
    assert(toks.map(_.pos).toSeq == Seq(0, 1, 2))
    assert((toks(1).status & TokenStatus.Overlap) != 0)
    assert((toks(2).status & TokenStatus.Unmatured) != 0)
  }

  test("bigram GET mode: stride n, unmatured tail forces prefix") {
    val toks = Analyzers.bigram.tokenize("日本語", TokenizeMode.Get)
    assert(toks.map(_.term).toSeq == Seq("日本", "語"))
    assert(toks.map(_.pos).toSeq == Seq(0, 2)) // positions line up with ADD
    assert((toks(1).status & TokenStatus.ForcePrefix) != 0)
  }

  test("bigram: mixed script positions stay aligned") {
    val toks = Analyzers.bigram.tokenize("spark 2.0 リリース")
    assert(toks.map(t => (t.term, t.pos)).toSeq == Seq(
      ("spark", 0), ("2", 1), (".", 2), ("0", 3),
      ("リリ", 4), ("リー", 5), ("ース", 6), ("ス", 7)))
  }

  test("bigram variants: split symbol/alpha produce grams") {
    val t1 = Analyzers.bigramSplitSymbolAlpha.tokenize("abc")
    assert(t1.map(_.term).toSeq == Seq("ab", "bc", "c"))
    val t2 = Analyzers.bigram.tokenize("abc")
    assert(t2.map(_.term).toSeq == Seq("abc"))
  }

  test("trigram / unigram") {
    assert(Analyzers.trigram.tokenize("日本語だよ").map(_.term).toSeq ==
      Seq("日本語", "本語だ", "語だよ", "だよ", "よ"))
    assert(Analyzers.unigram.tokenize("日本").map(_.term).toSeq == Seq("日", "本"))
  }

  test("ignore blank unifies across spaces") {
    val toks = Analyzers.bigramIgnoreBlank.tokenize("ab cd")
    assert(toks.map(_.term).toSeq == Seq("abcd"))
  }

  test("delimit tokenizer") {
    val toks = Analyzers.delimit.tokenize("Hello  World\tFoo")
    assert(toks.map(_.term).toSeq == Seq("hello", "world", "foo"))
  }

  test("stop word filter") {
    val toks = TokenFilters.stopWords(Set("the"))(Analyzers.bigram.tokenize("the spark engine"))
    assert(toks.map(_.term).toSeq == Seq("spark", "engine"))
  }

  test("countTokens equals tokenize().length") {
    val samples = Seq("", "spark search", "日本語のテスト", "a1!?日本 mixed 42",
      "ab cd", " spaced   out ", "ＡｂＣ①",
      graft.corpus.WebCorpus.text(5, 42L)._1)
    for (s <- samples; t <- Seq(Analyzers.bigram, Analyzers.trigram,
        Analyzers.bigramSplitSymbolAlpha, Analyzers.bigramIgnoreBlank)) {
      assert(t.countTokens(s) == t.tokenize(s).length, s"'$s' with ${t.name}")
    }
  }

  test("tokenizeWithOffsets matches tokenize() term/pos — including loose streams") {
    val loose = Analyzers.byName("TokenNgram:n=2,loose_symbol=true,loose_blank=true")
    val samples = Seq("090-1234-5678", "ab-cd ef", "日本 語!テスト", "plain text",
      "ＡｂＣ-123", "")
    for (t <- Seq(Analyzers.bigram, loose); s <- samples) {
      val plain = t.tokenize(s).map(x => (x.term, x.pos)).toSeq
      val offs = t.tokenizeWithOffsets(s)
      assert(offs.map(x => (x.term, x.pos)).toSeq == plain, s"'$s' with ${t.name}")
      // offsets (outside the zero-width separator) must be ordered, in range
      offs.filter(_.term != "￰").foreach { o =>
        assert(o.start >= 0 && o.end <= s.length && o.start < o.end, s"'$s' tok $o")
        // loose-stream offsets map back to the chars that produced the term
        // (symbol/blank-stripped): the raw slice contains the term's first char
        if (o.term.nonEmpty && s == "090-1234-5678")
          assert(s.substring(o.start, o.end).contains(o.term.charAt(0).toString))
      }
    }
    // loose stream emitted: stripped token present with offsets spanning the raw
    val offs = loose.tokenizeWithOffsets("090-1234")
    val joined = offs.find(_.term == "0901234")
    assert(joined.isDefined, "stripped loose token must appear in offset stream")
    assert(joined.get.start == 0 && joined.get.end == 8)
  }

  test("@Nfkc pre-normalizer: options round-trip and unify before tokenizing") {
    val t = Analyzers.byName("TokenBigram@Nfkc(unify_kana=true)")
    assert(t.name == "TokenBigram@Nfkc(unify_kana=true)")
    assert(Analyzers.byName(t.name).name == t.name) // manifest round-trip
    // katakana input tokenizes identically to its hiragana form
    assert(t.tokenize("カタカナ検索").map(x => (x.term, x.pos)).toSeq ==
      Analyzers.bigram.tokenize("かたかな検索").map(x => (x.term, x.pos)).toSeq)
    // filter chain composes after the normalizer spec
    val tf = Analyzers.byName("TokenBigram@Nfkc(unify_kana=true)+TokenFilterStopWord(the)")
    assert(tf.tokenize("the カナ").map(_.term).toSeq ==
      Analyzers.bigram.tokenize("かな").map(_.term).toSeq)
    intercept[UnsupportedOperationException](t.tokenizeWithOffsets("カナ"))
  }

  test("bigram equals regex word split on pure ascii alnum text") {
    // the invariant the DuckDB oracle relies on for the documents table
    val s = "the fast key order sort 42 batches"
    val expect = s.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    assert(Analyzers.bigram.terms(s).toSeq == expect)
  }
}
