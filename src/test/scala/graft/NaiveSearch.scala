package graft

import graft.analyzer.{Analyzers, TokenizeMode, Tokenizer}
import graft.query.Bm25

/** In-memory reference implementation of match + scoring used as the test
  * oracle (role of groonga's .expected golden transcripts, SURVEY.md §5).
  * Deliberately simple: full scans, no index, no pruning.
  */
final class NaiveSearch(docs: Seq[(Long, String)], tokenizerName: String = "TokenBigram") {
  private val tokenizer: Tokenizer = Analyzers.byName(tokenizerName)

  val tokenized: Map[Long, Array[graft.analyzer.Token]] =
    docs.map { case (id, t) => id -> tokenizer.tokenize(t) }.toMap
  val dl: Map[Long, Int] = tokenized.map { case (id, ts) => id -> ts.length }
  val nDocs: Long = docs.count { case (id, _) => dl(id) > 0 }
  val avgdl: Double = if (nDocs == 0) 0 else dl.values.sum.toDouble / nDocs
  val df: Map[String, Long] = tokenized.values
    .flatMap(_.map(_.term).distinct).groupBy(identity)
    .map { case (t, xs) => t -> xs.size.toLong }

  def tf(docId: Long, term: String): Int = tokenized(docId).count(_.term == term)

  def bm25(docId: Long, term: String, k1: Double = 2.0, b: Double = 0.75): Double = {
    val t = tf(docId, term)
    if (t == 0) 0.0
    else Bm25.idf(nDocs, df.getOrElse(term, 0L)) *
      Bm25.weight(t.toDouble, dl(docId).toDouble, avgdl, k1, b)
  }

  def andMatch(terms: Seq[String]): Seq[Long] =
    docs.collect { case (id, _) if terms.forall(t => tf(id, t) > 0) => id }.sorted

  def orMatch(terms: Seq[String]): Seq[Long] =
    docs.collect { case (id, _) if terms.exists(t => tf(id, t) > 0) => id }.sorted

  def quorumMatch(terms: Seq[String], min: Int): Seq[Long] =
    docs.collect { case (id, _) if terms.count(t => tf(id, t) > 0) >= min => id }.sorted

  def tfScoreAnd(terms: Seq[String]): Map[Long, Double] =
    andMatch(terms).map(id => id -> terms.map(t => tf(id, t)).sum.toDouble).toMap

  def bm25ScoreAnd(terms: Seq[String]): Map[Long, Double] =
    andMatch(terms).map(id => id -> terms.map(t => bm25(id, t)).sum).toMap

  def bm25ScoreOr(terms: Seq[String]): Map[Long, Double] =
    orMatch(terms).map(id => id -> terms.map(t => bm25(id, t)).sum).toMap

  /** exact top-k under the reference tie order (-score, docId) */
  def topK(scores: Map[Long, Double], k: Int): Seq[(Long, Double)] =
    scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(k)

  /** phrase occurrences per doc via GET-mode query offsets */
  def phraseMatch(phrase: String): Map[Long, Int] = {
    val qt = tokenizer.tokenize(phrase, TokenizeMode.Get).map(t => (t.term, t.pos))
    docs.flatMap { case (id, _) =>
      val pos: Map[String, Array[Int]] =
        tokenized(id).groupBy(_.term).map { case (t, ts) => t -> ts.map(_.pos) }
      if (!qt.forall(t => pos.contains(t._1))) None
      else {
        val base = qt.head
        val n = pos(base._1).count { p0 =>
          qt.tail.forall { case (t, qp) => pos(t).contains(p0 + qp - base._2) }
        }
        if (n > 0) Some(id -> n) else None
      }
    }.toMap
  }
}
