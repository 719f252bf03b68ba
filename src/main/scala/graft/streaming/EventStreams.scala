package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured-Streaming event analytics over an append-only event log:
  * watermarked tumbling-window aggregation and custom-state sessionization
  * (`flatMapGroupsWithState` + event-time timeout). Groonga's analogue is
  * the sharded time-series plugins (reference
  * plugins/sharding/logical_count.rb, logical_range_filter.rb) which scan
  * committed time shards batch-style; Spark's native re-expression is a
  * streaming query with a watermark, which subsumes the shard pruning
  * (state eviction) AND handles late/out-of-order arrivals, which the
  * shard plugins cannot.
  *
  * Determinism contract (what makes these gate-able against DuckDB):
  *  - Spark tracks the event-time watermark in MILLISECONDS (max event
  *    time floored to ms, minus the delay), so the oracles floor their
  *    max-event-time to ms before subtracting the delay — both engines
  *    evaluate the finalization predicate at the same granularity (an
  *    exact-micros oracle would emit a window whose end lands in the
  *    sub-millisecond gap that Spark's ms watermark has not yet passed);
  *  - sums are integer cents (`round(value*100)`), never float order-
  *    dependent accumulation;
  *  - emitted timestamps are epoch-micro BIGINTs, immune to timestamp
  *    rendering differences between engines.
  *
  * At 100 TB the same code runs unchanged: the parquet directory becomes
  * the landing zone of a firehose, `Trigger.AvailableNow` becomes a
  * processing-time trigger, and state lives in the checkpointed state
  * store partitioned by grouping key — nothing here collects to the
  * driver or holds more than one open session per key in memory.
  */
object EventStreams {

  /** one micro-batch event after projection */
  case class Ev(user_id: Long, ts: Timestamp, us: Long, cents: Long)

  /** open-session state: all event-time fields in epoch micros */
  case class SessState(startUs: Long, endUs: Long, n: Long, cents: Long)

  /** emitted session */
  case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, sum_cents: Long)

  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // the file source needs an explicit schema; take it from a batch read.
    // ts lands as TIMESTAMP_NTZ from the driver's parquet — cast to the
    // session-UTC instant type so watermarks and unix_micros are exact.
    val schema = spark.read.parquet(path).schema
    // FileStreamSource force-sets basePath to the source path for
    // NON-glob paths, and a single-file basePath is rejected ("must be a
    // directory"). A glob that matches exactly the events file keeps the
    // source from injecting basePath; in production the path is a
    // directory of landed files and none of this applies.
    spark.readStream.schema(schema).parquet(s"$dir/events.[p]arquet")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling-window counts + exact cent sums per event type, append mode:
    * a window row is emitted only once the watermark passes its end —
    * i.e. the stream has declared the window complete. Late events inside
    * the `delay` horizon still land in their true window; older ones are
    * dropped (see EventStreamsSpec's restart case).
    */
  def windowedCounts(
      spark: SparkSession,
      dir: String,
      windowDur: String = "6 hours",
      delay: String = "1 hour",
      checkpoint: String = null,
      out: String = null): DataFrame = {
    val ck = Option(checkpoint).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-swck").toString)
    val outDir = Option(out).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-swout").toString)
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_cents"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`, event-time timeout). Per user: events more
    * than `gap` apart start a new session. Sessions closed by data (a
    * later event proves the gap passed) are emitted in-batch; each user's
    * open tail session is held in the state store with an event-time
    * timeout at `end + gap` and is emitted by the timeout once the
    * watermark passes it — exactly one session of state per user, ever.
    */
  def sessionize(
      spark: SparkSession,
      dir: String,
      gap: String = "6 hours",
      delay: String = "1 hour",
      checkpoint: String = null,
      out: String = null): DataFrame = {
    import spark.implicits._
    val ck = Option(checkpoint).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ssck").toString)
    val outDir = Option(out).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-ssout").toString)
    val gapUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(gapUs.months == 0 && gapUs.days == 0,
      "gap must be a sub-day interval (exact micros)")
    val gapMicros = gapUs.microseconds

    val ev: Dataset[Ev] = eventsStream(spark, dir)
      .withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[Ev]

    def emit(uid: Long, s: SessState): Session =
      Session(uid, s.startUs, s.endUs, s.n, s.cents)

    val sessions = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, events: Iterator[Ev], state: GroupState[SessState]) =>
          if (!events.hasNext) {
            // event-time timeout: the watermark passed end+gap — the open
            // session can never be extended again, emit and drop the state
            val outRows = state.getOption.map(emit(uid, _)).iterator.toSeq
            state.remove()
            outRows.iterator
          } else {
            // batch arrivals are unordered within the group: order by the
            // exact micro timestamp before the gap walk
            val evs = events.toIndexedSeq.sortBy(_.us)
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessState]
            evs.foreach { e =>
              open match {
                case Some(s) if e.us - s.endUs <= gapMicros =>
                  open = Some(SessState(s.startUs, math.max(s.endUs, e.us),
                    s.n + 1, s.cents + e.cents))
                case Some(s) =>
                  closed += s
                  open = Some(SessState(e.us, e.us, 1L, e.cents))
                case None =>
                  open = Some(SessState(e.us, e.us, 1L, e.cents))
              }
            }
            val tail = open.get
            state.update(tail)
            // timeout in millis, rounded UP so it never fires a hair early
            state.setTimeoutTimestamp((tail.endUs + gapMicros + 999) / 1000)
            closed.map(emit(uid, _)).iterator
          }
      }

    val q = sessions.toDF()
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
