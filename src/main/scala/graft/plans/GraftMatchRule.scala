package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal, Unevaluable}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import graft.index.GraftIndex
import graft.query.{QueryParser, ScoreMode}

/** Marker predicate `graft_match('<indexPath>', '<query>')` — fulltext
  * match in predicate position (`WHERE graft_match(...)`), the declarative
  * form of groonga's in-filter query() function. Never evaluated row-wise:
  * [[GraftMatchRule]] rewrites the enclosing Filter into a LEFT SEMI join
  * with the match kernel's result on doc_id. */
final case class GraftMatchMarker(indexPath: Expression, query: Expression)
    extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(indexPath, query)
  // Unevaluable keeps every built-in optimizer (ConvertToLocalRelation,
  // constant folding) from trying to EVALUATE the marker before
  // GraftMatchRule rewrites it; non-deterministic keeps pushdown from
  // moving it out of the Filter the rule pattern-matches.
  override lazy val deterministic: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(indexPath = newChildren(0), query = newChildren(1))
}

/** Optimizer rule: Filter(... AND graft_match(path, q) AND ...) over a
  * relation with doc_id → LEFT SEMI Join with the analyzed plan of the
  * match query (Select.eval → MatchKernel), remaining conjuncts kept as a
  * residual Filter. The SparkStrategy-free form: the match subplan is an
  * ordinary analyzed LogicalPlan, so Catalyst keeps optimizing it (join
  * selection, AQE) like any hand-written semi-join. */
final case class GraftMatchRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def litStr(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, _) => Some(s.toString)
    case _ => None
  }

  private def splitConjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond, child)
        if cond.exists(_.isInstanceOf[GraftMatchMarker]) =>
      val conjuncts = splitConjuncts(cond)
      val (markers, rest) = conjuncts.partition(_.isInstanceOf[GraftMatchMarker])
      // a marker nested under OR/NOT/etc. has no semi-join form — fail at
      // planning time with a usable message instead of at runtime
      rest.find(_.exists(_.isInstanceOf[GraftMatchMarker])).foreach { bad =>
        throw new IllegalArgumentException(
          s"graft_match must be a TOP-LEVEL AND-conjunct of the WHERE clause " +
            s"(found nested inside: ${bad.sql}); rewrite OR queries into the " +
            s"query string itself, e.g. graft_match(idx, 'a OR b')")
      }
      var out: LogicalPlan = child
      markers.foreach { case m: GraftMatchMarker =>
        val path = litStr(m.indexPath).getOrElse(
          throw new IllegalArgumentException("graft_match: indexPath must be a string literal"))
        val q = litStr(m.query).getOrElse(
          throw new IllegalArgumentException("graft_match: query must be a string literal"))
        val childDoc = out.output.find(_.name == "doc_id").getOrElse(
          throw new IllegalArgumentException(
            "graft_match needs a doc_id column on the filtered relation"))
        val idx = GraftIndex(spark, path)
        val matchPlan = graft.operators.Select
          .eval(idx, QueryParser.parse(q), ScoreMode.Tf)
          .select("doc_id")
          .queryExecution.analyzed
        val matchDoc = matchPlan.output.head
        out = Join(out, matchPlan, LeftSemi,
          Some(EqualTo(childDoc, matchDoc)), JoinHint.NONE)
      }
      if (rest.isEmpty) out else Filter(rest.reduce(And), out)
  }
}
