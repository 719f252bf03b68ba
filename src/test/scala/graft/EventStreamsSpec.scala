package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Crafted-corpus oracle for the streaming event analytics: exact window
  * emission under the watermark, custom-state sessionization (in-batch
  * close + event-time-timeout tail), and late-data drop across a
  * checkpoint restart. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600L * 1000000 // one hour in micros
  // 2024-03-01 00:00:00 UTC — an exact 6-hour boundary (epoch 1709251200 s)
  private val T0 = 1709251200L * 1000000

  private def writeEvents(dir: String, rows: Seq[(Long, Long, String, Double)]): Unit =
    rows.map { case (id, us, tpe, v) =>
      (id, new Timestamp(us / 1000), id % 7, tpe, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(s"$dir/events.parquet")

  test("windowed counts: only watermark-passed windows emit; late event dropped and state survives restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evw").toString
    val ck = s"$dir/ck"
    val out = s"$dir/out"

    // drain 1: w0 has 2 events, w1 has 1, w2 has 1 (max ts t0+13h →
    // watermark t0+12h → w0,w1 finalized, w2 held in state)
    writeEvents(dir, Seq(
      (0L, T0 + 1 * H, "a", 1.00), (1L, T0 + 2 * H, "a", 1.00),
      (2L, T0 + 7 * H, "a", 1.00), (3L, T0 + 13 * H, "a", 1.00)))
    val r1 = EventStreams.windowedCounts(spark, dir, "6 hours", "1 hour", ck, out)
      .select("window_start_us", "n", "sum_cents").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(r1.toSeq == Seq((T0, 2L, 200L), (T0 + 6 * H, 1L, 100L)))

    // drain 2 (same checkpoint): a LATE event in already-emitted w0
    // (older than the persisted watermark t0+12h → dropped), one more w2
    // event joining the held state, one w3 event that advances the
    // watermark to t0+19h → w2 emits with BOTH its events, w3 is held
    writeEvents(dir, Seq(
      (4L, T0 + 5 * H, "a", 9.99),                 // late → dropped
      (5L, T0 + 13 * H + H / 2, "a", 1.00),        // joins w2 state
      (6L, T0 + 20 * H, "a", 1.00)))               // w3, advances watermark
    val r2 = EventStreams.windowedCounts(spark, dir, "6 hours", "1 hour", ck, out)
      .select("window_start_us", "n", "sum_cents").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // cumulative parquet sink contents: w0 and w1 from drain 1, w2 from
    // drain 2 — w0 still n=2 (the late 9.99 event left no trace anywhere)
    assert(r2.toSeq ==
      Seq((T0, 2L, 200L), (T0 + 6 * H, 1L, 100L), (T0 + 12 * H, 2L, 200L)))
  }

  test("sessionize: in-batch close, timeout tail emission, unexpired tail held") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evs").toString
    // user 1 (ids ≡1 mod 7): events at t0, t0+1h → session closed by the
    //   t0+10h event (gap 8h > 6h); tail [t0+10h] times out because
    //   watermark t0+16h+1s passes t0+10h+6h
    // user 2 (ids ≡2 mod 7): single event at t0 → tail, times out
    // user 3 (ids ≡3 mod 7): the clock event at t0+17h+1s sets max ts;
    //   its own tail (t0+17h+1s + 6h) never times out → NOT emitted
    writeEvents(dir, Seq(
      (1L, T0, "a", 1.00), (8L, T0 + 1 * H, "a", 2.00),
      (15L, T0 + 10 * H, "a", 4.00),
      (2L, T0, "b", 8.00),
      (3L, T0 + 17 * H + 1000000, "c", 16.00)))
    val got = EventStreams.sessionize(spark, dir, "6 hours", "1 hour")
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_cents")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (1L, T0, T0 + 1 * H, 2L, 300L),            // closed by data
      (1L, T0 + 10 * H, T0 + 10 * H, 1L, 400L),  // tail via timeout
      (2L, T0, T0, 1L, 800L)))                   // tail via timeout
  }
}
