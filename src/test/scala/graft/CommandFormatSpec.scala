package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.CommandFormat

/** Envelope golden transcribed from the reference's own documented output
  * (doc/source/example/reference/commands/select/match_columns_simple.log:
  * `select Entries --match_columns content --query fast
  *  --output_columns '_key, _score'` returns
  * [[0,ts,el],[[[2],[["_key","ShortText"],["_score","Int32"]],
  *  ["Groonga",1],["Mroonga",2]]]]) — same data, zeroed timings. */
class CommandFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("select body + envelope match the reference doc example") {
    val df = Seq(("Groonga", 1), ("Mroonga", 2)).toDF("_key", "_score")
    val body = CommandFormat.body(df, nHits = 2)
    assert(body ==
      """[[2],[["_key","ShortText"],["_score","Int32"]],["Groonga",1],["Mroonga",2]]""")
    assert(CommandFormat.envelope(body) ==
      """[[0,0.0,0.0],[[[2],[["_key","ShortText"],["_score","Int32"]],["Groonga",1],["Mroonga",2]]]]""")
  }

  test("n_hits is the pre-limit count; rows are the limited page") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("_key", "n").limit(1)
    val body = CommandFormat.body(df, nHits = 57)
    assert(body.startsWith("[[57],"))
    assert(body.endsWith("""["a",1]]"""))
  }

  test("labeled drilldowns render as an object, positional as a list") {
    val dd = """[[3],[["_key","ShortText"],["_nsubrecs","Int32"]],["x",3]]"""
    assert(CommandFormat.envelope("[[1]]", Seq(dd)) ==
      s"[[0,0.0,0.0],[[[1]],$dd]]")
    assert(CommandFormat.envelope("[[1]]", labeled = Map("flag" -> dd)) ==
      s"""[[0,0.0,0.0],[[[1]],{"flag":$dd}]]""")
  }

  test("escaping, nulls, bools, floats") {
    val df = Seq((Option("say \"hi\"\n"), Option(true), Option(1.5)),
      (None: Option[String], None: Option[Boolean], None: Option[Double]))
      .toDF("s", "b", "f")
    val body = CommandFormat.body(df, 2)
    assert(body.contains("\"say \\\"hi\\\"\\n\""))
    assert(body.contains("[null,null,null]"))
    assert(body.contains("true") && body.contains("1.5"))
  }

  test("oversized unlimited result is refused") {
    val df = spark.range(100).toDF("i")
    intercept[IllegalArgumentException](CommandFormat.body(df, 100, maxRows = 10))
  }
}
