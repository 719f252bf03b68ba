package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyzer.{Analyzers, Token, TokenStatus, TokenizeMode}
import graft.index.GraftIndex

/** Goldens transcribed from the reference's own TokenRegexp suite
  * (test/command/suite/tokenizers/regexp/{add,get}/...): value+position
  * streams must match exactly, including the positions CONSUMED by tokens
  * the reference hides (ADD's empty blank-gap SKIP token, GET's stride
  * skips and the token cursor's unmatured-overlap rule,
  * lib/token_cursor.c:497-502). */
class TokenRegexpSpec extends AnyFunSuite {
  private val tok = Analyzers.byName("TokenRegexp")

  private def add(s: String): Seq[(String, Int)] =
    tok.tokenize(s, TokenizeMode.Add).map(t => (t.term, t.pos)).toSeq
  private def get(s: String): Seq[(String, Int)] =
    tok.tokenize(s, TokenizeMode.Get).map(t => (t.term, t.pos)).toSeq

  test("ADD goldens: one/two/three/four") {
    assert(add("x") == Seq(("￯", 0), ("x", 1), ("￰", 2)))
    assert(add("xy") == Seq(("￯", 0), ("xy", 1), ("y", 2), ("￰", 3)))
    assert(add("xyz") == Seq(("￯", 0), ("xy", 1), ("yz", 2), ("z", 3), ("￰", 4)))
    assert(add("abcd") ==
      Seq(("￯", 0), ("ab", 1), ("bc", 2), ("cd", 3), ("d", 4), ("￰", 5)))
  }

  test("ADD golden: blank gap consumes one position (normalizer/blank)") {
    assert(add("abcd\nefgh") == Seq(("￯", 0),
      ("ab", 1), ("bc", 2), ("cd", 3), ("d", 4),
      ("ef", 6), ("fg", 7), ("gh", 8), ("h", 9), ("￰", 10)))
  }

  test("GET golden: long input strides with skips, full-bigram tail") {
    assert(get("abcdefghijk") ==
      Seq(("ab", 0), ("cd", 2), ("ef", 4), ("gh", 6), ("ij", 8), ("jk", 9)))
  }

  test("GET goldens: begin mark re-anchors (begin/one,two,three)") {
    assert(get("￯x") == Seq(("￯", 0), ("x", 1)))
    assert(get("￯xy") == Seq(("￯", 0), ("xy", 1)))
    assert(get("￯xyz") == Seq(("￯", 0), ("xy", 1), ("yz", 2)))
    // begin/one: the unmatured tail is a forced prefix (input end, no mark)
    val one = tok.tokenize("￯x", TokenizeMode.Get)
    assert((one.last.status & TokenStatus.ForcePrefix) != 0)
  }

  test("GET goldens: end mark (end/one..four, begin_end/one)") {
    assert(get("x￰") == Seq(("x", 0), ("￰", 1)))
    assert(get("xy￰") == Seq(("xy", 0), ("￰", 2)))
    assert(get("xyz￰") == Seq(("xy", 0), ("yz", 1), ("￰", 3)))
    assert(get("abcd￰") == Seq(("ab", 0), ("cd", 2), ("￰", 4)))
    assert(get("￯x￰") == Seq(("￯", 0), ("x", 1), ("￰", 2)))
    // begin_end/one: x is matured-by-marks, NOT a forced prefix
    val be = tok.tokenize("￯x￰", TokenizeMode.Get)
    assert(be.forall(t => (t.status & TokenStatus.ForcePrefix) == 0))
  }

  test("GET goldens: blanks (normalizer/blank/less_after, less_before)") {
    val la = tok.tokenize("abc\nd", TokenizeMode.Get)
    assert(la.map(t => (t.term, t.pos)).toSeq ==
      Seq(("ab", 0), ("bc", 1), ("d", 3)))
    assert((la.last.status & TokenStatus.ForcePrefix) != 0)
    assert(get("a\ndef") == Seq(("a", 0), ("de", 1), ("ef", 2)))
  }

  test("ADD/GET positions align for anchored phrase matching") {
    // doc "spark rest" vs anchored query ￯spark: every GET token must sit
    // at the same position the ADD stream indexed it at (base offset 0)
    val doc = add("spark rest").toMap
    get("￯spark").foreach { case (t, p) => assert(doc(t) == p, s"token $t") }
    // end-anchored: GET positions relative to the end mark line up too
    val doc2 = add("xyscan").toMap
    val q = get("scan￰")
    val base = doc2("sc") - q.head._2
    q.foreach { case (t, p) => assert(doc2(t) == base + p, s"token $t") }
  }

  test("required-literal extraction is sound and anchor-aware") {
    assert(GraftIndex.regexpRequiredLiteral("spark") == (("spark", true, true)))
    assert(GraftIndex.regexpRequiredLiteral("sp[aeiou]rk") == (("sp", true, false)))
    assert(GraftIndex.regexpRequiredLiteral("batch batch") == (("batch", true, false)))
    assert(GraftIndex.regexpRequiredLiteral("ab?cde") == (("cde", false, true)))
    assert(GraftIndex.regexpRequiredLiteral("abc*") == (("ab", true, false)))
    assert(GraftIndex.regexpRequiredLiteral("ab+cd") == (("ab", true, false)))
    assert(GraftIndex.regexpRequiredLiteral("qu.r*y")._1 == "qu")
    // groups stop the scan; runs before them stay usable (the '|' inside
    // the group is group-local, so "abcd" is still required)
    assert(GraftIndex.regexpRequiredLiteral("abcd(x|y)ef") == (("abcd", true, false)))
    // a TOP-LEVEL alternation requires NO literal: "a|b" matches "b"
    // without containing "a" — pruning on "a" would drop it (r6 ADVICE
    // high: false negatives in indexed regexp search)
    assert(GraftIndex.regexpRequiredLiteral("a|b") == (("", false, false)))
    assert(GraftIndex.regexpRequiredLiteral("spark|scan") == (("", false, false)))
    assert(GraftIndex.regexpRequiredLiteral("ab(c)d|e") == (("", false, false)))
    // escaped '|' is a literal, not an alternation
    assert(GraftIndex.regexpRequiredLiteral("a\\|b") == (("a|b", true, true)))
    // trailing lone backslash: malformed — no bogus literal '\'
    assert(GraftIndex.regexpRequiredLiteral("ab\\")._1 == "ab")
    assert(GraftIndex.regexpRequiredLiteral("\\d+") == (("", false, false)))
    assert(GraftIndex.regexpRequiredLiteral("a\\.b") == (("a.b", true, true)))
  }

  test("indexed regexp candidates are a sound superset; confirm is exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      (1L, "spark scan merge"), (2L, "fast spark window"), (3L, "sparse scan"),
      (4L, "spork batch batch"), (5L, "the batch scan"), (6L, "scan"),
      (7L, "deep scans run"), (8L, "spark"), (9L, "scanspark end scan"))
    val df = texts.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-rx").toString + "/idx"
    val idx = graft.index.IndexBuilder.build(spark, df, "doc_id", "text", dir,
      graft.index.IndexConfig(tokenizer = "TokenRegexp"))
    def matched(pattern: String): Set[Long] = {
      val cands = idx.searchRegexpGrams(pattern) match {
        case Some(c) => df.join(c.select(col("doc_id")), Seq("doc_id"))
        case None => df
      }
      cands.where(col("text").rlike(pattern)).select("doc_id").as[Long].collect().toSet
    }
    def naive(pattern: String): Set[Long] =
      texts.filter(t => java.util.regex.Pattern.compile(pattern).matcher(t._2).find())
        .map(_._1).toSet
    for (p <- Seq("\\Aspark", "scan\\z", "\\Aspark\\z", "sp[aeiou]rk",
        "batch batch", "sp.rk", "scan", "s..n", "\\Athe batch",
        "merge\\z", "\\Ascanspark", "xyzzy")) {
      assert(matched(p) == naive(p), s"pattern $p")
    }
    // the dictionary regexp path fails fast on a grams index (its
    // dictionary holds bigrams + marks — matching it would be silently
    // wrong, not merely slow)
    intercept[IllegalArgumentException](idx.searchRegexp("qu.*y"))
    // anchored candidates actually prune: ￯-anchored phrase must not
    // return docs where the literal is mid-text
    val beginCands = idx.searchRegexpGrams("\\Aspark").get
      .select("doc_id").as[Long].collect().toSet
    assert(beginCands.contains(1L) && beginCands.contains(8L))
    assert(!beginCands.contains(2L), "mid-text 'spark' must be pruned by the begin mark")
    assert(!beginCands.contains(9L), "'scanspark' run-interior match must be pruned")
  }
}
