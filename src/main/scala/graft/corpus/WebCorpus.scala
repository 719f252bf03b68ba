package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic Common-Crawl-style corpus generator (FIXTURES.md §1).
  *
  * Schema matches the authoritative input hint:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  *
  * Fully deterministic: every field derives from splitmix64(seed, docIndex)
  * — no wall clock, no java.util.Random state, safe under task retries
  * (the resumability invariant of SURVEY.md §7 risk (c)).
  *
  * The vocabulary is Zipf-distributed (head-term skew exercises the salted
  * posting shuffle) and a fixed fraction of docs embeds known phrases and
  * Japanese text to exercise the n-gram tokenizer paths.
  */
object WebCorpus {

  final val Phrases = Array(
    "spark fulltext search engine",
    "inverted index posting list",
    "block max wand pruning",
    "web scale crawl data")

  final val JaSnippets = Array(
    "全文検索エンジン",
    "転置インデックス構築",
    "日本語のテストデータ")

  private final val VocabSize = 8192

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** word for vocab rank r (0-based): deterministic letter sequence */
  def word(r: Int): String = {
    val syll = Array("ka", "to", "mi", "re", "su", "na", "be", "lo", "gi", "da",
      "pu", "we", "sho", "ri", "ta", "zen", "mar", "vel", "dor", "lin")
    val sb = new StringBuilder
    var x = r + 7
    do { sb.append(syll(x % syll.length)); x /= syll.length } while (x > 0)
    sb.toString
  }

  /** Zipf(s=1)-ish rank sample in [0, VocabSize) from a uniform 64-bit draw */
  private def zipfRank(u64: Long): Int = {
    val u = ((u64 >>> 11).toDouble / (1L << 53).toDouble).max(1e-12)
    val r = math.exp(u * math.log(VocabSize.toDouble)) - 1.0
    math.min(VocabSize - 1, r.toInt)
  }

  def text(docIndex: Long, seed: Long): (String, String) = {
    val h0 = splitmix64(seed ^ docIndex)
    val lang = if ((h0 & 0xff) < 26) "ja" else "en" // ~10% ja
    val nWords = 40 + (splitmix64(h0 + 1) & 0x7f).toInt // 40..167 words
    val sb = new StringBuilder(nWords * 7)
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      sb.append(word(zipfRank(splitmix64(h0 + 2 + i))))
      i += 1
    }
    // ~12% of docs embed a known phrase (exact-phrase / topk test targets)
    val hp = splitmix64(h0 + 900001)
    if ((hp & 0xff) < 31) {
      sb.append(' ').append(Phrases((hp >>> 8).toInt.abs % Phrases.length))
    }
    if (lang == "ja") {
      val hj = splitmix64(h0 + 900002)
      sb.append(' ').append(JaSnippets((hj >>> 8).toInt.abs % JaSnippets.length))
    }
    (sb.toString, lang)
  }

  /** Distributed generator: n docs on `partitions` partitions. docId == the
    * range index (dense, deterministic — url sort order equals id order). */
  def generate(spark: SparkSession, n: Long, partitions: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions)
      .select($"id".as("doc_id"))
      .as[Long]
      .map { i =>
        val (t, lang) = text(i, seed)
        val url = f"https://example.org/crawl/${i}%012d"
        val ts = new java.sql.Timestamp(1700000000000L + i * 1000L)
        (i, url, ts, t.getBytes("UTF-8"), t, lang)
      }
      .toDF("doc_id", "url", "warc_ts", "html", "text", "lang")
  }

  /** render `t` as an HTML page: markup-significant chars become named
    * refs, every non-ASCII char a numeric ref — so extraction exercises
    * BOTH expansion paths of NormalizerHTML on every CJK doc. */
  def wrapHtml(t: String, title: String = ""): String = {
    val sb = new StringBuilder(t.length + 96)
    sb.append("<html><head><meta charset=\"utf-8\"><title>").append(title)
      .append("</title></head><body><p class=\"main\">")
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      cp match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        // C1 controls (80-9F) must stay LITERAL: a numeric ref for them
        // remaps through the WHATWG windows-1252 table on expansion, which
        // would break the byte-identity extraction invariant; lone
        // surrogates likewise (numeric refs for them expand to U+FFFD)
        case c if c > 0x9f && !(c >= 0xD800 && c <= 0xDFFF) =>
          sb.append("&#x").append(c.toHexString).append(';')
        case c => sb.appendAll(Character.toChars(c))
      }
      i += Character.charCount(cp)
    }
    sb.append("</p></body></html>")
    sb.toString
  }

  /** generate() with the html column holding a REAL page (tags + character
    * references) instead of raw text bytes — the ingestion-shaped corpus.
    * Kept separate so build-throughput benches don't pay the wrap cost. */
  def generateHtml(spark: SparkSession, n: Long, partitions: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions)
      .select($"id".as("doc_id"))
      .as[Long]
      .map { i =>
        val (t, lang) = text(i, seed)
        val url = f"https://example.org/crawl/${i}%012d"
        val ts = new java.sql.Timestamp(1700000000000L + i * 1000L)
        (i, url, ts, wrapHtml(t).getBytes("UTF-8"), t, lang)
      }
      .toDF("doc_id", "url", "warc_ts", "html", "text", "lang")
  }

  /** Text extraction from the html binary column — the ingestion front of
    * the pipeline (input-hint invariant: extracted text is byte-identical
    * to the `text` column per url). Distributed map over NormalizerHTML;
    * output (doc_id, url, extracted). */
  def extractText(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id".cast("long"), $"url".cast("string"), $"html")
      .as[(Long, String, Array[Byte])]
      .map { case (id, url, html) =>
        (id, url, graft.analyzer.HtmlNormalizer.normalize(new String(html, "UTF-8")))
      }
      .toDF("doc_id", "url", "extracted")
  }
}
