package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Suggest
import graft.operators.Suggest.LearnEvent

/** The streaming learner must fold to EXACTLY the batch learner's tables
  * on the same in-order event log, no matter how micro-batches slice it —
  * deltas are a commutative monoid, session tails carry the walk state
  * across batch boundaries. */
class SuggestStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // two interleaved sessions; ts gaps exercise the 60 s horizon, the
  // submit-anchor (freq1), multi-prior freq0 walks and token freq2
  private val log = Seq(
    LearnEvent(1, 1000000L, "sp", submit = false),
    LearnEvent(1, 2000000L, "spa", submit = false),
    LearnEvent(2, 2500000L, "eng", submit = false),
    LearnEvent(1, 3000000L, "spark engine", submit = true),
    LearnEvent(2, 4000000L, "engine", submit = true),
    LearnEvent(1, 5000000L, "spark", submit = true), // prior submit -> freq1
    LearnEvent(1, 70000000L, "sq", submit = false), // 65 s after: horizon
    LearnEvent(1, 71000000L, "sql", submit = true),
    LearnEvent(2, 90000000L, "engine room", submit = true))

  private def runStream(chunks: Seq[Seq[LearnEvent]]): (Map[String, (Long, Long, Long)],
      Map[(String, String), (Long, Long, Long)]) = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[LearnEvent]
    val name = s"learn_deltas_${System.nanoTime()}"
    val q = Suggest.learnStream(mem.toDF()).toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    q.stop()
    val (items, pairs) = Suggest.mergeDeltas(spark.table(name))
    val im = items.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val pm = pairs.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    (im, pm)
  }

  private lazy val batch: (Map[String, (Long, Long, Long)],
      Map[(String, String), (Long, Long, Long)]) = {
    import spark.implicits._
    val (items, pairs) = Suggest.learn(log.toDF())
    (items.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap,
      pairs.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap)
  }

  test("single-batch stream equals the batch learner") {
    val (im, pm) = runStream(Seq(log))
    assert(im == batch._1)
    assert(pm == batch._2)
  }

  test("micro-batch slicing mid-session changes nothing (state carries the tail)") {
    // split right between a prior and its post, and between submits
    val (im, pm) = runStream(Seq(log.take(2), log.slice(2, 5), log.slice(5, 7), log.drop(7)))
    assert(im == batch._1)
    assert(pm == batch._2)
  }

  test("the walk semantics themselves (hand-checked expectations)") {
    val pm = batch._2
    // seq 1 first submit: both keystrokes within 60 s -> freq0
    assert(pm(("sp", "spark engine"))._1 == 1L)
    assert(pm(("spa", "spark engine"))._1 == 1L)
    // consecutive submits: prior submit adds freq1
    assert(pm(("spark engine", "spark"))._2 == 1L)
    // horizon: 'spark'(5s) is 66 s before 'sql'(71s) -> no pair
    assert(!pm.contains(("spark", "sql")))
    // 'sq' (70 s) is 1 s before 'sql' -> freq0
    assert(pm(("sq", "sql"))._1 == 1L)
    // token learning: distinct tokens != item
    assert(pm(("spark", "spark engine"))._3 == 1L)
    assert(pm(("engine", "spark engine"))._3 == 1L)
    // 'engine' submit: token == item is skipped entirely
    assert(pm.get(("engine", "engine")).isEmpty)
    // seq 2: 'engine room' at 90 s — 86 s after the 'engine' submit, so no
    // freq1 across the horizon; only the token-learning freq2 survives
    assert(pm(("engine", "engine room")) == ((0L, 0L, 1L)))
    // items: freq counts every event, freq2 submits only
    assert(batch._1("spark engine") == ((1L, 1L, 3000000L)))
    assert(batch._1("sp")._1 == 1L && batch._1("sp")._2 == 0L)
  }
}
