package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Structured-Streaming correctness gates: each drains the static events
  * table through a REAL streaming query (file source → watermark →
  * stateful op → parquet sink, `Trigger.AvailableNow`) and the DuckDB
  * oracle replays the append-mode emission contract in SQL — including
  * the finalization predicate (only windows/sessions the watermark has
  * passed are ever emitted). See graft.streaming.EventStreams. */
object StreamQueries {

  // 6 h window/gap, 1 h watermark delay — all in epoch micros in the SQL
  private val WinUs = 6L * 3600 * 1000000
  private val DelayUs = 1L * 3600 * 1000000

  /** watermarked tumbling-window aggregation, append mode */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    EventStreams.windowedCounts(spark, dir, "6 hours", "1 hour")
      .orderBy("window_start_us", "event_type")

  val streamWindowAggSql: String =
    s"""WITH w AS (
       |  SELECT CAST(epoch_us(ts) - epoch_us(ts) % $WinUs AS BIGINT)
       |           AS window_start_us,
       |         event_type, count(*) AS n,
       |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
       |           AS sum_cents
       |  FROM events GROUP BY 1, 2),
       |-- watermark granularity: Spark tracks max event time in MILLIS
       |-- (floor), so the oracle floors to ms before subtracting the delay
       |mx AS (SELECT max(epoch_us(ts)) // 1000 * 1000 AS mus FROM events)
       |SELECT window_start_us, event_type, n, sum_cents FROM w, mx
       |WHERE window_start_us + $WinUs <= mus - $DelayUs
       |ORDER BY window_start_us, event_type""".stripMargin

  /** flatMapGroupsWithState gap sessionization, event-time timeout */
  def streamSessions(spark: SparkSession, dir: String): DataFrame =
    EventStreams.sessionize(spark, dir, "6 hours", "1 hour")
      .orderBy("user_id", "session_start_us")

  val streamSessionsSql: String =
    s"""WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
       |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       |s AS (SELECT user_id, us, cents,
       |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
       |               IS NULL
       |             OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
       |               > $WinUs
       |             THEN 1 ELSE 0 END AS brk FROM e),
       |g AS (SELECT user_id, us, cents,
       |        sum(brk) OVER (PARTITION BY user_id ORDER BY us) AS sid
       |      FROM s),
       |agg AS (SELECT user_id, sid,
       |          min(us) AS session_start_us, max(us) AS session_end_us,
       |          count(*) AS n_events,
       |          CAST(sum(cents) AS BIGINT) AS sum_cents
       |        FROM g GROUP BY 1, 2),
       |-- ms-floored max event time = Spark's watermark granularity
       |mx AS (SELECT CAST(max(epoch_us(ts)) // 1000 * 1000 AS BIGINT) AS mus
       |       FROM events),
       |l AS (SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY 1)
       |SELECT a.user_id, a.session_start_us, a.session_end_us, a.n_events,
       |       a.sum_cents
       |FROM agg a JOIN l USING (user_id), mx
       |WHERE a.sid < l.last_sid
       |   OR a.session_end_us + $WinUs <= mus - $DelayUs
       |ORDER BY a.user_id, a.session_start_us""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_window_agg" -> streamWindowAgg,
    "stream_sessions" -> streamSessions)

  val oracles: Map[String, String] = Map(
    "stream_window_agg" -> streamWindowAggSql,
    "stream_sessions" -> streamSessionsSql)
}
