package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.GraftIndex

/** Suggest family (reference: plugins/suggest/suggest.c — completion,
  * correction, suggestion over learned reading/co-occurrence tables).
  * Spark-first re-expression over the index's own statistics: the term
  * dictionary IS the reading table (df = popularity), so
  *  - complete  = prefix scan (optionally romaji-kana) ranked by df
  *  - correct   = edit-distance candidates ranked by (distance, df)
  *  - suggest   = co-occurring terms of the query terms ranked by joint df
  * Learned-log weighting would swap df for a click-count column — the
  * plumbing is identical.
  */
object Suggest {

  /** completion: dictionary terms starting with `prefix` (df-ranked,
    * deterministic ties by term) */
  def complete(idx: GraftIndex, prefix: String, k: Int = 10): DataFrame =
    idx.terms.where(col("term").startsWith(prefix))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .orderBy(desc("df"), asc("term")).limit(k)

  /** completion against a LEARNED frequency table — the reference suggest
    * dataset's `item_<dataset>` table, which the query-log learner
    * populates with submit counts (plugins/suggest/suggest.c; the
    * suggest command ranks completions by that frequency). `learned`
    * columns: (term, freq). Rank = (learned freq desc, dictionary df
    * desc, term): items never seen in the logs fall back to corpus
    * popularity — the cold-start behavior of a fresh dataset. The learned
    * table is expected to be small relative to the dictionary (it is
    * bounded by observed queries), so it rides a broadcast join. */
  def completeLearned(idx: GraftIndex, prefix: String, learned: DataFrame,
      k: Int = 10): DataFrame =
    idx.terms.where(col("term").startsWith(prefix))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .join(broadcast(learned.where(col("term").startsWith(prefix))
        .groupBy(col("term")).agg(sum(col("freq")).as("freq"))),
        Seq("term"), "left")
      .withColumn("freq", coalesce(col("freq"), lit(0L)))
      .orderBy(desc("freq"), desc("df"), asc("term")).limit(k)
      .select(col("term"), col("freq"), col("df"))

  /** completion for a romaji prefix over a kana dictionary */
  def completeRk(idx: GraftIndex, romajiPrefix: String, k: Int = 10): DataFrame = {
    val cands = graft.analyzer.Romaji.candidates(romajiPrefix)
    if (cands.isEmpty) return idx.terms.select(col("term"), col("df")).limit(0)
    idx.terms.where(cands.map(c => col("term").startsWith(c)).reduce(_ || _))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .orderBy(desc("df"), asc("term")).limit(k)
  }

  /** correction: terms within `maxDistance` edits, nearest + most frequent
    * first (deterministic ties by term) */
  def correct(idx: GraftIndex, term: String, maxDistance: Int = 2, k: Int = 10): DataFrame =
    idx.terms
      .where(length(col("term"))
        .between(term.length - maxDistance, term.length + maxDistance))
      .withColumn("dist", levenshtein(lit(term), col("term")))
      .where(col("dist") <= maxDistance && col("term") =!= term)
      .groupBy(col("term"), col("dist")).agg(sum(col("df")).as("df"))
      .orderBy(asc("dist"), desc("df"), asc("term")).limit(k)

  /** suggestion: terms co-occurring with `term` in the corpus, by number of
    * co-occurring docs (the co-occurrence table of the reference's learner,
    * computed from the index instead of a query log).
    *
    * Scale shape: the postings scan is PRUNED to the matched docs' bucket
    * set with per-bucket doc-range overlap (bucket/min_doc/max_doc are
    * parquet columns with row-group stats, so untouched buckets are never
    * read) and rows are filtered by a broadcast sorted-id binary search
    * BEFORE grouping — never a full-index decode. Matched docs are capped
    * at `maxDocs` (smallest ids first, deterministic). */
  def suggest(idx: GraftIndex, term: String, k: Int = 10,
      maxDocs: Int = 10000): DataFrame = {
    import idx.spark.implicits._
    val ids = idx.searchTerms(Seq(term)).select(col("doc_id"))
      .orderBy(asc("doc_id")).limit(maxDocs).as[Long].collect().sorted
    if (ids.isEmpty)
      return idx.spark.emptyDataset[(String, Long)].toDF("co_term", "n_docs")
    val bits = idx.meta.bucketBits
    // pushdown stays DATA, not expression shape: one `bucket IN (...)` plus
    // a global doc-range overlap (both parquet row-group prunable) — a
    // per-bucket OR Column chain would be a 10k-node expression tree when
    // 10k docs scatter over 10k buckets. The exact per-bucket [min,max]
    // check rides a broadcast map and runs before any payload decode.
    val byBucket: Map[Int, (Long, Long)] =
      ids.groupBy(id => (id >> bits).toInt)
        .map { case (b, ds) => b -> (ds.min, ds.max) }
    val prune = col("bucket").isin(byBucket.keys.toSeq: _*) &&
      col("max_doc") >= ids.head && col("min_doc") <= ids.last
    val idsBc = idx.spark.sparkContext.broadcast(ids)
    val rangesBc = idx.spark.sparkContext.broadcast(byBucket)
    val co = idx.postings.where(prune).as[graft.index.PostingBlockRow]
      .flatMap { b =>
        val (lo, hi) = rangesBc.value(b.bucket)
        if (b.max_doc < lo || b.min_doc > hi) Iterator.empty
        else {
          val set = idsBc.value
          val d = graft.codec.PostingCodec.decode(b.payload)
          (0 until d.count).iterator
            .filter(i => java.util.Arrays.binarySearch(set, d.docIds(i)) >= 0)
            .map(i => (b.term, d.docIds(i)))
        }
      }.toDF("co_term", "doc_id")
    co.where(col("co_term") =!= term)
      .groupBy(col("co_term")).agg(countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("n_docs"), asc("co_term")).limit(k)
  }
}
