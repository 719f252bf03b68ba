package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (whole-stage codegen) — no UDFs, no shuffles except
  * where aggregation is inherent.
  */
object TextAnalysis {

  /** tiny built-in stopword-marker profiles (language ID heuristic) */
  final val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "fr" -> Seq("le", "la", "les", "des", "est"))

  /** language-ID: count marker-word hits per language, argmax with
    * deterministic ties (lexicographic), 'und' when no hits. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val hitCols = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits = markers.map(m =>
        size(filter(toks, t => t === m))).reduce[Column](_ + _)
      hits.as(s"hits_$lang")
    }
    val withHits = docs.select((col(idCol).as("doc_id") +: hitCols): _*)
    val langs = LangMarkers.keys.toSeq.sorted
    val best = langs.map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    // first lexicographic language reaching the max hit count wins; 'und' if 0
    val pred = langs.reverse.foldLeft(lit("und")) { (elze, l) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(elze)
    }
    withHits.select(col("doc_id"), pred.as("lang_pred"), best.as("hits"))
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
}
