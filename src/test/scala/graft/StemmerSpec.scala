package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analyzer.{Analyzers, PorterStemmer, SStemmer}

/** Porter stemmer checked against the worked examples of the 1980 paper
  * (every pair below appears verbatim in Porter's "An algorithm for suffix
  * stripping"), plus filter-pipeline wiring. */
class StemmerSpec extends AnyFunSuite {

  private val porterExamples = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "communism" -> "commun", "activate" -> "activ", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("Porter stemmer matches the paper's worked examples") {
    val bad = porterExamples.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("Porter is idempotent on its own output over a vocabulary") {
    val vocab = Seq("searching", "searches", "queries", "relations", "indexing",
      "tokenized", "normalization", "clusters", "embedding", "probabilities")
    vocab.foreach { w =>
      val s = PorterStemmer.stem(w)
      assert(PorterStemmer.stem(s) == s || s.nonEmpty)
    }
  }

  test("S-stemmer rules") {
    assert(SStemmer.stem("queries") == "query")
    assert(SStemmer.stem("merges") == "merge")
    assert(SStemmer.stem("tables") == "table")
    assert(SStemmer.stem("windows") == "window")
    assert(SStemmer.stem("glass") == "glass") // ss kept
    assert(SStemmer.stem("corpus") == "corpus") // us kept
    assert(SStemmer.stem("goes") == "goes") // oes kept
    assert(SStemmer.stem("query") == "query")
  }

  test("analyzer spec round-trips through byName with filters") {
    val spec = "TokenBigram+TokenFilterStemS+TokenFilterStopWord(a,of,the)"
    val tok = Analyzers.byName(spec)
    assert(tok.name == spec)
    val toks = tok.tokenize("the queries of tables")
    assert(toks.map(_.term).toSeq == Seq("query", "table"))
    // positions NOT renumbered after stop-word drop
    assert(toks.map(_.pos).toSeq == Seq(1, 3))
  }

  test("TokenNgram option spec parses and changes tokenization") {
    val t3 = Analyzers.byName("TokenNgram:3")
    assert(t3.asInstanceOf[graft.analyzer.NgramTokenizer].opts.n == 3)
    val custom = Analyzers.byName("TokenNgram:n=2,unify_alphabet=false,ignore_blank=true")
    val o = custom.asInstanceOf[graft.analyzer.NgramTokenizer].opts
    assert(o.n == 2 && !o.unifyAlphabet && o.ignoreBlank)
    // unify_alphabet=false grams latin text instead of word tokens
    assert(custom.tokenize("abcd").map(_.term).toSeq == Seq("ab", "bc", "cd", "d"))
    assert(Analyzers.bigram.tokenize("abcd").map(_.term).toSeq == Seq("abcd"))
    // composes with filters
    val f = Analyzers.byName("TokenNgram:n=2,unify_alphabet=false+TokenFilterStopWord(ab)")
    assert(f.tokenize("abcd").map(_.term).toSeq == Seq("bc", "cd", "d"))
    intercept[IllegalArgumentException](Analyzers.byName("TokenNgram:bogus=1"))
  }

  test("romaji -> hiragana conversion and prefix candidates") {
    import graft.analyzer.Romaji
    assert(Romaji.toHiragana("kana") == Some("かな"))
    assert(Romaji.toHiragana("shinkansen") == Some("しんかんせん"))
    assert(Romaji.toHiragana("gakkou") == Some("がっこう"))
    assert(Romaji.toHiragana("kyoto") == Some("きょと"))
    assert(Romaji.toHiragana("xq") == None)
    // prefix candidates: complete syllables convert, lone consonant expands
    assert(Romaji.candidates("ka") == Seq("か"))
    val k = Romaji.candidates("k")
    assert(Set("か", "き", "く", "け", "こ", "きゃ").subsetOf(k.toSet))
    val kak = Romaji.candidates("kak")
    assert(kak.contains("かか") && kak.contains("かき"))
    assert(Romaji.candidates("kan").contains("かん"))
    assert(Romaji.candidates("gakk").exists(_.startsWith("がっ")))
  }

  test("prefix_rk_search over a kana dictionary") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-rk").toString
    val docs = Seq(
      (0L, "かな がっこう きょうと"),
      (1L, "かき くも けん"),
      (2L, "さくら すし")).toDF("doc_id", "text")
    val idx = graft.index.IndexBuilder.build(spark, docs, "doc_id", "text",
      s"$tmp/idx", graft.index.IndexConfig(tokenizer = "TokenDelimit"))
    val viaK = idx.expandPrefixRk("k")
    assert(viaK.toSet == Set("かな", "かき", "くも", "けん", "きょうと"))
    assert(idx.expandPrefixRk("ka").toSet == Set("かな", "かき"))
    assert(idx.expandPrefixRk("gakk").toSet == Set("がっこう"))
    assert(idx.expandPrefixRk("sa").toSet == Set("さくら"))
    assert(idx.expandPrefixRk("zz").isEmpty)
  }

  test("unify_kana filter folds katakana to hiragana (index+query symmetric)") {
    val tok = Analyzers.byName("TokenBigram+TokenFilterUnifyKana")
    val kata = tok.tokenize("データベース").map(_.term).toSeq
    val hira = tok.tokenize("でーたべーす").map(_.term).toSeq
    assert(kata == hira, s"$kata vs $hira")
    assert(kata.head == "でー")
    // prolonged sound mark ー is not kana and passes through
    assert(kata.forall(!_.exists(c => c >= 'ァ' && c <= 'ヶ')))
  }

  test("suggest complete/correct over a small index") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sugg").toString
    val docs = Seq(
      (0L, "spark sparse sort"), (1L, "spark sort"), (2L, "spork data"))
      .toDF("doc_id", "text")
    val idx = graft.index.IndexBuilder.build(spark, docs, "doc_id", "text",
      s"$tmp/idx", graft.index.IndexConfig(tokenizer = "TokenBigram"))
    val comp = graft.operators.Suggest.complete(idx, "sp", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(comp == Seq(("spark", 2L), ("spark", 2L)).distinct ++ Seq(("sparse", 1L), ("spork", 1L))
      || comp == Seq(("spark", 2L), ("sparse", 1L), ("spork", 1L)))
    val corr = graft.operators.Suggest.correct(idx, "spark", 1, 5)
      .collect().map(_.getString(0)).toSeq
    assert(corr == Seq("spork")) // distance 1, 'sparse' is 2 away
    val sugg = graft.operators.Suggest.suggest(idx, "spark", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sugg("sort") == 2L && sugg("sparse") == 1L && !sugg.contains("data"))
  }

  test("TokenTable greedy longest-match tokenization") {
    val tok = new graft.analyzer.TableTokenizer(Set("ab", "abc", "cd", "x"))
    // longest match wins: "abc" over "ab"; unmatched chars skipped
    assert(tok.tokenize("abcdzx").map(_.term).toSeq == Seq("abc", "x"))
    assert(tok.tokenize("abcd").map(_.term).toSeq == Seq("abc"))
    assert(tok.tokenize("zzcdzz").map(_.term).toSeq == Seq("cd"))
    assert(tok.tokenize("qqq").isEmpty)
    // normalization applies before matching
    assert(tok.tokenize("ABCD").map(_.term).toSeq == Seq("abc"))
  }

  test("loose_symbol emits a secondary stripped stream; GET queries match it") {
    import graft.query.MatchMode
    val tok = Analyzers.byName("TokenNgram:n=2,loose_symbol=true")
    // ADD: primary stream, end-mark ￰, then the symbol-stripped stream
    val add = tok.tokenize("090-1234").map(_.term).toSeq
    assert(add == Seq("090", "-", "1234", "￰", "0901234"), add.toString)
    // GET: the stripped form only (what the query searches)
    val get = tok.tokenize("0901234", graft.analyzer.TokenizeMode.Get).map(_.term).toSeq
    assert(get == Seq("0901234"))
    // symbol-free input: no loose stream at all
    assert(tok.tokenize("plain words").map(_.term).toSeq == Seq("plain", "words"))
    // countTokens stays consistent with tokenize
    assert(tok.countTokens("090-1234") == 5)
    // end-to-end: a symbol-free query matches a symbol-bearing doc
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-loose").toString
    val docs = Seq((0L, "call 090-1234 now"), (1L, "other text")).toDF("doc_id", "text")
    val idx = graft.index.IndexBuilder.build(spark, docs, "doc_id", "text",
      s"$tmp/idx", graft.index.IndexConfig(tokenizer = "TokenNgram:n=2,loose_symbol=true"))
    val q = idx.analyzeQuery("0901234").map(_._1)
    val got = idx.searchTerms(q, MatchMode.All).collect().map(_.getLong(0)).toSet
    assert(got == Set(0L))
  }

  test("stemmed index matches inflected query forms") {
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-stem").toString
    val docs = Seq(
      (0L, "spark merges the tables"),
      (1L, "spark merge of a table"),
      (2L, "nothing relevant here")).toDF("doc_id", "text")
    val idx = graft.index.IndexBuilder.build(spark, docs, "doc_id", "text",
      s"$tmp/idx", graft.index.IndexConfig(
        tokenizer = "TokenBigram+TokenFilterStemS"))
    val q = idx.analyzeQuery("tables").map(_._1)
    val got = idx.searchTerms(q, graft.query.MatchMode.All)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L))
  }
}
