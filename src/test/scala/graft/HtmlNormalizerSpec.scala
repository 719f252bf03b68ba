package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyzer.HtmlNormalizer
import graft.analyzer.HtmlNormalizer.Options

/** NormalizerHTML goldens transcribed from the reference's own test suite
  * (test/command/suite/normalizers/html — types.expected, checks.expected)
  * plus edge-state cases derived from lib/normalizer.c:6185-6360. */
class HtmlNormalizerSpec extends AnyFunSuite {
  private def n(s: String) = HtmlNormalizer.normalize(s)

  test("reference golden: types.expected") {
    // &#x80; remaps through windows-1252 to € (U+20AC)
    assert(n("a&lt;b&#x80;<b>c</b>&#x3042;d") == "a<b€cあd")
  }

  test("reference golden: checks.expected (incl. unterminated tag)") {
    assert(n("a&lt;b&amp;<b>c</b>&#65;d&#x5A;e<b") == "a<b&cAdZe")
  }

  test("named entities: markup, latin-1, punctuation, greek, math") {
    assert(n("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'")
    assert(n("&nbsp;&copy;&eacute;&uuml;&szlig;") == " ©éüß")
    assert(n("&ndash;&mdash;&hellip;&euro;&trade;") == "–—…€™")
    assert(n("&alpha;&Omega;&pi;&sigmaf;") == "αΩπς")
    assert(n("&le;&ge;&ne;&rarr;&infin;") == "≤≥≠→∞")
  }

  test("names are case-sensitive; unknown names stay literal with ';'") {
    assert(n("&AMP;") == "&AMP;") // HTML4 table has no AMP (HTML5 does)
    assert(n("&bogus;") == "&bogus;")
    assert(n("&Euro;") == "&Euro;")
  }

  test("numeric refs: decimal, hex, windows-1252 remap, FFFD cases") {
    assert(n("&#65;&#x41;&#X41;") == "AAA")
    assert(n("&#12354;") == "あ")
    for ((in, cp) <- Seq("&#x80;" -> 0x20AC, "&#x99;" -> 0x2122,
        "&#x9F;" -> 0x0178, "&#145;" -> 0x2018))
      assert(n(in) == new String(Character.toChars(cp)), in)
    // 0, surrogates, out-of-range → U+FFFD (grn_text_code_point)
    assert(n("&#0;") == "�")
    assert(n("&#xD800;") == "�")
    assert(n("&#x110000;") == "�")
    assert(n("&#x1F600;") == new String(Character.toChars(0x1F600)))
  }

  test("invalid refs: literal flush, or state re-entry on '<'/'&' (reference fallthrough)") {
    assert(n("&#12a;") == "&#12a;") // stray letter in decimal
    assert(n("&#xZZ;") == "&#xZZ;")
    assert(n("&a b") == "&a b") // space aborts the ref, stays literal
    // '#' not directly after '&' aborts
    assert(n("&a#b;") == "&a#b;")
    // the reference's IN_CHAR_REF case falls through into the default
    // handler (normalizer.c:6293-6310): '<' under remove_tag DROPS the
    // pending ref and opens a tag...
    assert(n("a&b<c>d") == "ad")
    // ...unless remove_tag is off, in which case '<' is an ordinary
    // non-name char and the run flushes literally
    assert(HtmlNormalizer.normalize("a&b<c>d",
      Options(removeTag = false)) == "a&b<c>d")
    // '&' under expand drops the pending ref and RESTARTS a reference
    assert(n("&&amp;") == "&")
    assert(n("&x&y&amp;z") == "&z")
  }

  test("unterminated tag and unterminated ref at EOF are dropped") {
    assert(n("x<unclosed") == "x")
    assert(n("x&amp") == "x")
  }

  test("options: remove_tag / expand_character_reference independently off") {
    val raw = "<b>a</b>&amp;b"
    assert(HtmlNormalizer.normalize(raw, Options(removeTag = false)) == "<b>a</b>&b")
    assert(HtmlNormalizer.normalize(raw,
      Options(expandCharacterReference = false)) == "a&amp;b")
    assert(HtmlNormalizer.normalize(raw,
      Options(removeTag = false, expandCharacterReference = false)) == raw)
  }

  test("Normalizer.byName resolves the reference normalizer names") {
    import graft.analyzer.Normalizer
    assert(Normalizer.byName("NormalizerAuto")("ＡＢＣ Spark") == "abc spark")
    assert(Normalizer.byName("NormalizerNFKC130")("ＡＢＣ") == "abc")
    assert(Normalizer.byName("NormalizerNFKC(unify_kana=true)")("アイウ") == "あいう")
    assert(Normalizer.byName("NormalizerHTML")("<b>a</b>&amp;") == "a&")
    assert(Normalizer.byName("NormalizerHTML(remove_tag=false)")("<b>a</b>&amp;")
      == "<b>a</b>&")
    intercept[IllegalArgumentException](Normalizer.byName("NormalizerBogus"))
  }

  test("ingestion invariant: extracted text is byte-identical per url") {
    // the north-rule per-row invariant over the input shape
    // (url, warc_ts, html BINARY, text, lang): NormalizerHTML extraction of
    // the real-HTML corpus (tags + named + numeric refs, CJK as &#x...;)
    // reproduces the text column EXACTLY, distributed
    val spark = TestSpark.spark
    val docs = graft.corpus.WebCorpus.generateHtml(spark, 500, partitions = 4)
    val joined = graft.corpus.WebCorpus.extractText(docs)
      .join(docs.select("doc_id", "text"), "doc_id")
    import org.apache.spark.sql.functions.col
    val mismatches = joined.where(col("extracted") =!= col("text")).count()
    assert(mismatches == 0, s"$mismatches docs extract differently")
    assert(joined.count() == 500)
    // and the html really exercises both ref paths: some doc carries CJK
    val aJa = docs.where(col("lang") === "ja").select("html").head()
      .getAs[Array[Byte]](0)
    assert(new String(aJa, "UTF-8").contains("&#x"))
  }

  test("TokenBigram@Html indexes raw html identically to text (manifest round-trip)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-htmltok").toString
    val docs = graft.corpus.WebCorpus.generateHtml(spark, 120, partitions = 2)
      .withColumn("html_str", col("html").cast("string"))
    val cfg = graft.index.IndexConfig(bucketBits = 5)
    val overHtml = graft.index.IndexBuilder.build(spark, docs, "doc_id", "html_str",
      s"$tmp/idx-html", cfg.copy(tokenizer = "TokenBigram@Html"))
    val overText = graft.index.IndexBuilder.build(spark, docs, "doc_id", "text",
      s"$tmp/idx-text", cfg)
    assert(overHtml.meta.tokenizer == "TokenBigram@Html") // manifest round-trip
    assert(overHtml.meta.nDocs == overText.meta.nDocs)
    assert(math.abs(overHtml.meta.avgdl - overText.meta.avgdl) < 1e-9,
      "html extraction must not change the analyzed token stream")
    import graft.query.{MatchMode, ScoreMode}
    val a = overHtml.searchTerms(Seq("spark"), MatchMode.Any, ScoreMode.Bm25())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = overText.searchTerms(Seq("spark"), MatchMode.Any, ScoreMode.Bm25())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, s) => assert(math.abs(s - b(id)) < 1e-9) }
    // phrase positions survive extraction
    val ph = "spark fulltext search engine"
    assert(overHtml.searchPhrase(ph).collect().map(_.getLong(0)).toSet ==
      overText.searchPhrase(ph).collect().map(_.getLong(0)).toSet)
  }

  test("multibyte content passes through; tags around CJK strip clean") {
    assert(n("<p>日本語</p>") == "日本語")
    // multibyte char inside a pending ref flushes the ref literally
    assert(n("&aあ;") == "&aあ;")
  }
}
