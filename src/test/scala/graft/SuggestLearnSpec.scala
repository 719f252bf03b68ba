package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Suggest

/** Learner-ingestion walk semantics, transcribed from the reference
  * (plugins/suggest/suggest.c learner_learn_for_complete_and_correcnt /
  * learner_learn_for_suggest / learner_increment_item_freq):
  *  - freq0 per non-submit prior inside the 60 s horizon, newest-first;
  *  - a prior SUBMIT gets freq1 and STOPS the walk;
  *  - a gap >= 60 s stops the walk WITHOUT counting;
  *  - freq2 per distinct token of the submitted item, skipping a token
  *    equal to the whole item;
  *  - items: freq per event, freq2 per submit, last = newest event time. */
class SuggestLearnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def us(s: Long) = s * 1000000L

  // one session exercising every branch + a second session with a
  // prior-less submit
  private lazy val events = Seq(
    (1L, us(0), "a b", false),
    (1L, us(10), "ab", false),
    (1L, us(20), "abc d", true), // counts both keystrokes (freq0), tokens abc,d
    (1L, us(30), "x", false),
    (1L, us(45), "xy z", true),  // x -> freq0; the t=20 SUBMIT -> freq1, STOP
    (1L, us(200), "late", true), // newest prior gap 155 s -> nothing; 1 token = item -> no freq2
    (2L, us(0), "s1", true)      // no priors
  ).toDF("seq_id", "ts_us", "item", "submit")

  test("pair walk: freq0 chain, freq1 stop, gap break, freq2 tokens") {
    val (_, pairs) = Suggest.learn(events)
    val got = pairs.orderBy("pre", "post")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val want = Seq(
      ("a b", "abc d", 1L, 0L, 0L),
      ("ab", "abc d", 1L, 0L, 0L),
      ("abc", "abc d", 0L, 0L, 1L),
      ("abc d", "xy z", 0L, 1L, 0L),
      ("d", "abc d", 0L, 0L, 1L),
      ("x", "xy z", 1L, 0L, 0L),
      ("xy", "xy z", 0L, 0L, 1L),
      ("z", "xy z", 0L, 0L, 1L)).sortBy(p => (p._1, p._2))
    assert(got == want)
  }

  test("items: freq per event, freq2 per submit, last = newest time") {
    val (items, _) = Suggest.learn(events)
    val got = items.orderBy("item")
      .as[(String, Long, Long, Long)].collect().toSeq
    val want = Seq(
      ("a b", 1L, 0L, us(0)),
      ("ab", 1L, 0L, us(10)),
      ("abc d", 1L, 1L, us(20)),
      ("late", 1L, 1L, us(200)),
      ("s1", 1L, 1L, us(0)),
      ("x", 1L, 0L, us(30)),
      ("xy z", 1L, 1L, us(45)))
    assert(got == want)
  }

  test("repeated item accumulates; stop-at-submit isolates older history") {
    val ev2 = Seq(
      (9L, us(0), "q", false),
      (9L, us(5), "q", false),
      (9L, us(10), "qq", true),  // q -> freq0 twice (same pair, two events)
      (9L, us(15), "qq", true)   // prior submit qq at t=10 -> freq1, STOP
    ).toDF("seq_id", "ts_us", "item", "submit")
    val (items, pairs) = Suggest.learn(ev2)
    val p = pairs.orderBy("pre", "post")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(p == Seq(("q", "qq", 2L, 0L, 0L), ("qq", "qq", 0L, 1L, 0L)))
    val it = items.where($"item" === "qq")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(it == Seq(("qq", 2L, 2L, us(15))))
  }
}
