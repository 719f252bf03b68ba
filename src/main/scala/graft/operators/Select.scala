package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.index.GraftIndex
import graft.query._
import graft.query.QueryParser._

/** Server-less `select` command (SURVEY.md §3.1): query-syntax evaluation
  * over the index with groonga result-set semantics, then the select
  * pipeline — post_filter, scorer, sort (+offset/limit), drilldowns.
  *
  * Result-set ops (/root/reference/lib/table_selector.c:462-575 merge ops):
  *   OR       union, scores accumulate
  *   AND      intersection, scores accumulate
  *   AND_NOT  anti-join
  */
object Select {

  final case class Drilldown(keys: Seq[String], limit: Int = 10)

  final case class Request(
      query: String,
      score: ScoreMode = ScoreMode.Tf,
      sortKeys: Seq[(String, Boolean)] = Seq(("score", false), ("doc_id", true)), // (col, asc)
      offset: Int = 0,
      limit: Int = 10,
      postFilter: Option[Column] = None,
      scorer: Option[DataFrame => Column] = None)

  /** evaluate a parsed query node to (doc_id, score) */
  def eval(idx: GraftIndex, node: Node, score: ScoreMode): DataFrame = node match {
    case TermQ(t, w) =>
      idx.searchTerms(Seq(t), MatchMode.Any, score, weights = Map(t -> w))
    case PhraseQ(p) =>
      idx.searchPhrase(p, score)
    case PrefixQ(p) =>
      val expanded = idx.expandPrefix(p)
      if (expanded.isEmpty) idx.emptyResult
      else idx.searchTerms(expanded, MatchMode.Any, score)
    case AndQ(l, r) =>
      val a = eval(idx, l, score)
      val b = eval(idx, r, score).withColumnRenamed("score", "score_r")
      a.join(b, Seq("doc_id"))
        .select(col("doc_id"), (col("score") + col("score_r")).as("score"))
    case OrQ(l, r) =>
      eval(idx, l, score).unionByName(eval(idx, r, score))
        .groupBy(col("doc_id")).agg(sum(col("score")).as("score"))
    case NotQ(l, r) =>
      eval(idx, l, score)
        .join(eval(idx, r, score).select("doc_id"), Seq("doc_id"), "left_anti")
  }

  /** full select: query -> post_filter -> scorer -> sort/offset/limit */
  def select(idx: GraftIndex, req: Request): DataFrame = {
    var df = eval(idx, QueryParser.parse(req.query), req.score)
    req.postFilter.foreach(f => df = df.where(f))
    req.scorer.foreach(fn => df = df.withColumn("score", fn(df)))
    val sortCols = req.sortKeys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    var out = df.orderBy(sortCols: _*)
    if (req.offset > 0) out = out.offset(req.offset)
    if (req.limit >= 0) out = out.limit(req.limit)
    out
  }

  /** drilldown over a match result joined with its source table */
  def drilldown(matched: DataFrame, source: DataFrame, keys: Seq[String],
      limit: Int = 10): DataFrame =
    matched.join(source, Seq("doc_id"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("nsubrecs"))
      .orderBy(desc("nsubrecs") +: keys.map(col(_).asc): _*)
      .limit(limit)
}
