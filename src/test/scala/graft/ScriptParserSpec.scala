package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.query.ScriptParser

class ScriptParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "hello world", "en", 11L),
    (2L, "bonjour tout le monde", "fr", 21L),
    (3L, "hello-hyphen", "en", 12L),
    (4L, "worldly matters", "de", 15L),
    (5L, "short", "en", 5L)).toDF("doc_id", "text", "lang", "n")

  private def ids(script: String): Seq[Long] =
    df.where(ScriptParser.compile(script)).select("doc_id")
      .as[Long].collect().sorted.toSeq

  test("filter script rows equal the hand-built Column") {
    assert(ids("""lang == "en" && n >= 11""") ==
      df.where(col("lang") === "en" && col("n") >= 11)
        .select("doc_id").as[Long].collect().sorted.toSeq)
    assert(ids("""text @ "world" || text @^ "bon"""") == Seq(1L, 2L, 4L))
    assert(ids("""text @$ "hyphen"""") == Seq(3L))
    assert(ids("""text @~ "^w.*s$"""") == Seq(4L))
    assert(ids("""lang == "en" &! text @ "hyphen"""") == Seq(1L, 5L))
    assert(ids("""n % 2 == 1 && n * 2 > 20""") == Seq(1L, 2L, 4L))
    assert(ids("""!(lang == "en")""") == Seq(2L, 4L))
    assert(ids("""n - 1 == 10""") == Seq(1L))
    assert(ids("""between(n, 11, "include", 15, "exclude")""") == Seq(1L, 3L))
    assert(ids("""between(n, 11, "exclude", 15, "include")""") == Seq(3L, 4L))
    assert(ids("""in_values(lang, "fr", "de")""") == Seq(2L, 4L))
    assert(ids("""edit_distance(lang, "enn") <= 1""") == Seq(1L, 3L, 5L))
    assert(ids("""length(text) == 5""") == Seq(5L))
    // precedence: && binds tighter than ||
    assert(ids("""lang == "fr" || lang == "en" && n > 10""") == Seq(1L, 2L, 3L))
  }

  test("parse errors are loud and specific") {
    def err(script: String): String =
      intercept[IllegalArgumentException](ScriptParser.compile(script)).getMessage
    assert(err("""lang == "unterminated""").contains("unterminated string"))
    assert(err("""no_such_fn(n)""").contains("unknown function"))
    assert(err("""n == 1 )""").contains("trailing input"))
    assert(err("""(n == 1""").contains("missing ')'"))
    assert(intercept[IllegalArgumentException](
      df.where(ScriptParser.compile("""between(n, 1, "sideways", 2, "include")"""))
        .count()).getMessage.contains("border"))
    assert(err("""n == """).contains("unexpected end"))
  }
}
