package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the LATEST right row (by
  * `timeCol`) with right.time <= left.time, matched on `keyCols` —
  * the time-series join Spark has no native operator for (the builder
  * brief's canonical custom-op example; DuckDB ships it as ASOF JOIN,
  * which is exactly what the correctness oracle uses).
  *
  * Spark-first shape — NOT an inequality join (which Catalyst can only
  * execute as a broadcast-nested-loop at scale): tag both sides, UNION,
  * and run ONE window pass per key ordered by (time, side) carrying the
  * last right-row payload forward. Cost = one hash shuffle on the key +
  * a per-partition sort — the same shape as any windowed aggregation,
  * linear in |left| + |right|, skew-bounded by the hottest key.
  *
  * The right payload is carried as a SINGLE struct, so all attached
  * columns come from the SAME right row atomically (per-column
  * last(ignoreNulls) could otherwise mix rows when right columns contain
  * genuine nulls). Right rows sharing an identical (key, time) have an
  * unspecified pick order — pre-deduplicate the right side if that can
  * occur (the engine's synthetic event data has unique (key, time)).
  *
  * Equal timestamps match (<=): right rows order before left rows at the
  * same instant via the side tag.
  */
object AsofJoin {

  /** Match direction: Backward = latest right with right.time <=
    * left.time (the classic as-of); Forward = earliest right with
    * right.time >= left.time. Equal timestamps match in both. */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /** Output: every left column, plus `rightCols` each prefixed with
    * `prefix` (NULL when the key has no right row on the matching side
    * of the left row's time). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      rightCols: Seq[String],
      prefix: String = "asof_",
      direction: Direction = Backward): DataFrame = {
    require(rightCols.nonEmpty, "rightCols must name at least one column")
    val leftOnly = left.columns.toSeq.filterNot(c =>
      keyCols.contains(c) || c == timeCol)
    val payload = struct(rightCols.map(col): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(1).as("asof_side"),
        lit(null).cast(right.select(payload).schema.head.dataType).as("asof_payload")) ++
        leftOnly.map(col): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(timeCol), lit(0).as("asof_side"),
        payload.as("asof_payload")) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // Both directions use the SAME incremental [unboundedPreceding,
    // currentRow] frame with last(ignoreNulls) — Spark evaluates it in one
    // O(n) forward pass per partition. Forward direction just scans the
    // timeline DESCENDING ("earliest right at-or-after" = most recent
    // right seen while walking backward from +inf). The naive alternative
    // — first() over [currentRow, unboundedFollowing] — plans an
    // UnboundedFollowing frame that Spark recomputes from scratch per row:
    // O(n^2) on a hot key. Right rows carry side=0 so they order before
    // left rows at an equal timestamp in BOTH scan directions, keeping
    // equal-ts rights visible (<= / >= semantics).
    val ord = Window.partitionBy(keyCols.map(col): _*)
    val w = (direction match {
      case Backward => ord.orderBy(col(timeCol).asc, col("asof_side").asc)
      case Forward  => ord.orderBy(col(timeCol).desc, col("asof_side").asc)
    }).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_carried", last(col("asof_payload"), ignoreNulls = true).over(w))
      .where(col("asof_side") === 1)
      .select(keyCols.map(col) ++ Seq(col(timeCol)) ++ leftOnly.map(col) ++
        rightCols.map(c => col(s"asof_carried.$c").as(s"$prefix$c")): _*)
  }
}
