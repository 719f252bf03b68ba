package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (whole-stage codegen) — no UDFs, no shuffles except
  * where aggregation is inherent.
  */
object TextAnalysis {

  /** Language-ID profiles over 31 languages — Cavnar & Trenkle (1994)
    * style: a handful of highly DISCRIMINATIVE character n-grams per
    * language (function words with space boundaries, diacritics,
    * digraphs), weighted, plus per-char weights over Unicode script
    * ranges for non-Latin scripts. Same-script languages are separated by
    * marker weights on top of a shared base (ru/uk/bg over Cyrillic,
    * ja/zh over Han — kana dominates for ja). Patterns are substrings
    * matched on ' ' + lower(text) + ' '. */
  final val LangPatterns: Map[String, Seq[(String, Int)]] = Map(
    "en" -> Seq((" the ", 4), (" and ", 2), (" of ", 2), (" is ", 2), (" to ", 2)),
    "de" -> Seq((" der ", 3), (" die ", 3), (" und ", 3), (" ist ", 2), (" nicht ", 3), ("ß", 4)),
    "es" -> Seq((" el ", 3), (" los ", 3), (" es ", 2), (" que ", 2), ("ñ", 4), ("ción", 3)),
    "fr" -> Seq((" le ", 3), (" les ", 3), (" des ", 2), (" est ", 2), (" et ", 2), ("ç", 3), (" une ", 3)),
    "it" -> Seq((" il ", 3), (" che ", 3), (" di ", 2), (" per ", 2), (" gli ", 4), (" è ", 3)),
    "pt" -> Seq(("ção", 4), (" não ", 4), (" uma ", 3), (" os ", 2), ("ã", 3)),
    "nl" -> Seq((" het ", 4), (" een ", 3), (" van ", 3), (" niet ", 3), ("ij", 2)),
    "sv" -> Seq((" och ", 4), (" att ", 3), (" är ", 3), ("å", 2)),
    "da" -> Seq((" og ", 3), (" er ", 2), (" ikke ", 3), (" af ", 4), ("ø", 2)),
    "no" -> Seq((" og ", 3), (" er ", 2), (" av ", 4), (" på ", 3), ("ø", 2)),
    "fi" -> Seq((" ja ", 3), (" on ", 2), (" ei ", 3), ("ää", 4), ("kk", 2)),
    "pl" -> Seq((" nie ", 3), (" jest ", 3), ("ł", 4), ("ż", 3), ("ę", 3)),
    "cs" -> Seq((" je ", 2), (" se ", 2), ("ř", 5), ("ě", 4)),
    "sk" -> Seq((" je ", 2), (" sa ", 3), ("ľ", 5), ("ô", 4)),
    "hu" -> Seq((" az ", 3), (" és ", 4), (" nem ", 3), ("ő", 4), ("ű", 4)),
    "ro" -> Seq((" și ", 4), (" în ", 3), ("ă", 3), ("ț", 4)),
    "tr" -> Seq((" bir ", 3), (" ve ", 3), (" bu ", 2), ("ı", 3), ("ğ", 4), ("ş", 2)),
    "id" -> Seq((" yang ", 4), (" dan ", 3), (" di ", 2), (" itu ", 3)),
    "vi" -> Seq((" của ", 4), (" và ", 3), ("ư", 3), ("ạ", 3), ("ế", 3)),
    "ca" -> Seq((" els ", 4), (" amb ", 3), (" és ", 3), ("l·l", 5)),
    // uk/bg sit on ru's Cyrillic base (x2/char) — their exclusive letters
    // must outweigh the base-rate difference on marker-bearing text
    "uk" -> Seq(("ї", 12), ("є", 10), ("і", 5), ("ґ", 12)),
    "bg" -> Seq(("ъ", 10), ("щ", 4)))

  /** per-char script-range weights: lang → (loCodePoint, hiCodePoint,
    * weight-per-char). Cyrillic 0400-04FF, Greek 0370-03FF, Arabic
    * 0600-06FF, Hebrew 0590-05FF, Devanagari 0900-097F, Thai 0E00-0E7F,
    * kana 3040-30FF, Han 4E00-9FFF, Hangul syllables AC00-D7A3 +
    * jamo 1100-11FF. */
  final val LangScripts: Map[String, Seq[(Int, Int, Int)]] = Map(
    "ru" -> Seq((0x0400, 0x04FF, 2)),
    "uk" -> Seq((0x0400, 0x04FF, 1)),
    "bg" -> Seq((0x0400, 0x04FF, 1)),
    "el" -> Seq((0x0370, 0x03FF, 3)),
    "ar" -> Seq((0x0600, 0x06FF, 3)),
    "he" -> Seq((0x0590, 0x05FF, 3)),
    "hi" -> Seq((0x0900, 0x097F, 3)),
    "th" -> Seq((0x0E00, 0x0E7F, 3)),
    "ja" -> Seq((0x3040, 0x30FF, 3), (0x4E00, 0x9FFF, 1)),
    "zh" -> Seq((0x4E00, 0x9FFF, 2)),
    "ko" -> Seq((0xAC00, 0xD7A3, 3), (0x1100, 0x11FF, 3)))

  /** alphabetical language list (argmax tie order) */
  final val Langs: Seq[String] = (LangPatterns.keySet ++ LangScripts.keySet).toSeq.sorted

  /** one language's integer score as a SQL expression over a column `t`
    * holding ' ' || lower(text) || ' '. `duck` switches regexp_replace to
    * DuckDB's 4-arg global form — everything else is engine-shared SQL, so
    * the Spark plan and the DuckDB oracle are one definition. */
  def langScoreSql(lang: String, t: String, duck: Boolean): String = {
    val pats = LangPatterns.getOrElse(lang, Nil).map { case (p, w) =>
      s"CAST((length($t) - length(replace($t, '$p', ''))) / ${p.length} AS BIGINT) * $w"
    }
    val scripts = LangScripts.getOrElse(lang, Nil).map { case (lo, hi, w) =>
      val re = s"[^${new String(Character.toChars(lo))}-${new String(Character.toChars(hi))}]"
      if (duck) s"CAST(length(regexp_replace($t, '$re', '', 'g')) AS BIGINT) * $w"
      else s"CAST(length(regexp_replace($t, '$re', '')) AS BIGINT) * $w"
    }
    (pats ++ scripts).mkString(" + ")
  }

  /** language-ID: weighted profile scores per language, argmax with
    * deterministic ties (first alphabetical), 'und' when every score is 0.
    * One codegen'd projection — no shuffle, no UDF; ~190 replace/regexp
    * ops per row over a broadcast-free inline profile. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withT = docs.select(col(idCol).as("doc_id"),
      concat(lit(" "), lower(col(textCol)), lit(" ")).as("t"))
    val scoreCols = Langs.map(l => expr(langScoreSql(l, "t", duck = false)).as(s"s_$l"))
    val scored = withT.select(col("doc_id") +: scoreCols: _*)
    val best = Langs.map(l => col(s"s_$l")).reduce((a, b) => greatest(a, b))
    val pred = Langs.reverse.foldLeft(lit("und")) { (elze, l) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(elze)
    }
    scored.select(col("doc_id"), pred.as("lang_pred"), best.as("score"))
  }

  /** quality features + composite score (length / repetition / word shape) */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(
        col(idCol).as("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        length(col(textCol)).as("n_chars"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("mean_word_len",
        (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      // floor(x*1e4)/1e4 instead of round(): Spark round() is decimal-string
      // based, DuckDB's is binary — they disagree on exact-.5 boundaries
      // (e.g. 0.53475); floor on identical double bits is engine-identical.
      .withColumn("quality", floor((
        lit(0.5) * col("distinct_ratio") +
        lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
        lit(0.2) * (lit(1.0) - abs(col("mean_word_len") - 5.0) / 5.0)) * 10000) / 10000.0)
      .select(col("doc_id"), col("n_tokens"),
        (floor(col("distinct_ratio") * 10000) / 10000.0).as("distinct_ratio"),
        (floor(col("mean_word_len") * 10000) / 10000.0).as("mean_word_len"),
        col("quality"))
  }

  /** token counts: whitespace words + BPE-ish subword estimate
    * (ceil(len/4) pieces per word). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(
      col(idCol).as("doc_id"),
      size(toks).as("n_words"),
      aggregate(toks, lit(0L),
        (acc, w) => acc + ceil(length(w).cast("double") / 4.0).cast("long"))
        .as("n_subwords"))
  }

  /** rolling-hash document fingerprint (codegen'd PolyHash expression) */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), poly_hash(col(textCol)).as("fp"))

  /** Gopher-style within-document repetition metrics: for each word-n-gram
    * size in `ns`, the most repeated n-gram and the fraction of the
    * document's characters it occupies (count x gram chars / n_chars — the
    * "fraction of characters contained within the most frequent n-gram"
    * filter, made deterministic by ordering ties on (count desc, char
    * occupancy desc, gram asc)). Long output: (doc_id, n, top_gram,
    * top_cnt, top_frac), one row per (doc, n); docs shorter than n words
    * yield no row for that n.
    *
    * Scale shape: one groupBy keyed (doc_id, n, gram) with map-side
    * combine, then a per-(doc_id, n) window — both partitioned by doc; no
    * corpus-wide key. floor-x1e4 rounding (not round()) so Spark and
    * DuckDB produce identical doubles. */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty, "repetition needs at least one n-gram size")
    val toks = split(col(textCol), " ")
    val base = docs.select(col(idCol).as("doc_id"), toks.as("ts"),
      length(col(textCol)).as("n_chars"))
    val grams = ns.map { n =>
      base.select(col("doc_id"), col("n_chars"), lit(n).as("n"),
        explode(when(size(col("ts")) >= n,
          transform(sequence(lit(1), size(col("ts")) - n + 1),
            i => array_join(slice(col("ts"), i, lit(n)), " ")))
          .otherwise(array())).as("gram"))
    }.reduce(_ union _)
    val cnts = grams.groupBy(col("doc_id"), col("n_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val byDocN = Window.partitionBy("doc_id", "n")
      .orderBy(col("cnt").desc, (col("cnt") * length(col("gram"))).desc, col("gram"))
    cnts.withColumn("rn", row_number().over(byDocN)).where(col("rn") === 1)
      .select(col("doc_id"), col("n"), col("gram").as("top_gram"),
        col("cnt").as("top_cnt"),
        (floor((col("cnt") * length(col("gram"))).cast("double") / col("n_chars")
          * lit(10000.0)) / 10000.0).as("top_frac"))
  }

  /** PII patterns shared by the Spark plan and the DuckDB oracle — written
    * in the Java-regex/RE2 common dialect (\b, \d, bounded repetition all
    * mean the same thing in both engines). */
  final val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val PiiIp    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  final val PiiPhone = "\\+\\d{1,3}[ -]\\d{2,4}[ -]\\d{3,4}[ -]\\d{4}"

  /** PII scrubbing for training-data pipelines: count and redact emails,
    * phone numbers (+CC ddd-ddd-dddd shapes), and IPv4 literals. Pure
    * codegen'd projection — regexp_count + chained regexp_replace, no
    * shuffle, no UDF. Email is replaced first (it contains dots/digits),
    * then phones (no dots — cannot collide with IPv4), then IPs. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(PiiEmail)).as("n_emails"),
      regexp_count(col(textCol), lit(PiiPhone)).as("n_phones"),
      regexp_count(col(textCol), lit(PiiIp)).as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), PiiEmail, "<EMAIL>"),
          PiiPhone, "<PHONE>"),
        PiiIp, "<IP>").as("scrubbed"))
}
