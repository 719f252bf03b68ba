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

  test("v3 envelope matches the reference command_version 3 golden") {
    // Transcribed from the reference's own expected output for
    // `select Memos --drilldown tag --command_version 3`
    // (test/command/suite/select/drilldown/plain/command_version/3/
    //  no_conditions.expected), compacted: pretty-printing is the test
    // harness's, the wire shape is {"header":{...},"body":{...}} with the
    // plain drilldown keyed by its column name INSIDE the body. Reference
    // types (UInt32/Tags) come from its schema — here _id is Int64.
    val df = Seq(
      (1L, "groonga is fast!", "groonga"),
      (2L, "mroonga is fast!", "mroonga"),
      (3L, "groonga sticker!", "groonga"),
      (4L, "rroonga is fast!", "rroonga")).toDF("_id", "_key", "tag")
    val dd = Seq(("groonga", 2), ("mroonga", 1), ("rroonga", 1))
      .toDF("_key", "_nsubrecs")
    val out = CommandFormat.envelopeV3(
      CommandFormat.bodyV3(df, nHits = 4),
      drilldowns = Map("tag" -> CommandFormat.bodyV3(dd, nHits = 3)))
    assert(out ==
      """{"header":{"return_code":0,"start_time":0.0,"elapsed_time":0.0},""" +
      """"body":{"n_hits":4,"columns":[{"name":"_id","type":"Int64"},""" +
      """{"name":"_key","type":"ShortText"},{"name":"tag","type":"ShortText"}],""" +
      """"records":[[1,"groonga is fast!","groonga"],[2,"mroonga is fast!","mroonga"],""" +
      """[3,"groonga sticker!","groonga"],[4,"rroonga is fast!","rroonga"]],""" +
      """"drilldowns":{"tag":{"n_hits":3,"columns":[{"name":"_key","type":"ShortText"},""" +
      """{"name":"_nsubrecs","type":"Int32"}],""" +
      """"records":[["groonga",2],["mroonga",1],["rroonga",1]]}}}}""")
    // v3 reports _score as Float (v1 casts it to Int32) — lib/output.c:2204
    val scored = Seq(("a", 1.5)).toDF("_key", "_score")
    assert(CommandFormat.bodyV3(scored, 1).contains("""{"name":"_score","type":"Float"}"""))
  }

  test("nested arrays/structs render as JSON, non-finite doubles as null") {
    val df = Seq((Seq("s1", "s2"), Double.NaN, Double.PositiveInfinity))
      .toDF("snippets", "nan", "inf")
    val body = CommandFormat.body(df, 1)
    assert(body.contains("""["s1","s2"]"""), body)
    assert(body.contains("null,null"), body)
    assert(!body.toLowerCase.contains("list") && !body.contains("NaN"))
  }

  test("xml page matches the transform_xml target shape (golden)") {
    val df = Seq(("Groonga", 1), ("say <\"&hi\">", 2)).toDF("_key", "_score")
    val dd = Seq(("x", 3L)).toDF("_key", "_nsubrecs")
    val got = CommandFormat.xml(df, nHits = 2, offset = 0, limit = 10,
      drilldowns = Seq((dd, 1L)))
    val want =
      "<?xml version=\"1.0\" encoding=\"utf-8\"?>\n" +
      "<SEGMENTS>\n<SEGMENT>\n<RESULTPAGE>\n" +
      "<RESULTSET OFFSET=\"0\" LIMIT=\"2\" NHITS=\"2\">\n" +
      "<HIT NO=\"1\">\n" +
      "<FIELD NAME=\"_key\">Groonga</FIELD>\n" +
      "<FIELD NAME=\"_score\">1</FIELD>\n" +
      "</HIT>\n" +
      "<HIT NO=\"2\">\n" +
      "<FIELD NAME=\"_key\">say &lt;&quot;&amp;hi&quot;&gt;</FIELD>\n" +
      "<FIELD NAME=\"_score\">2</FIELD>\n" +
      "</HIT>\n" +
      "</RESULTSET>\n" +
      "<NAVIGATIONENTRY>\n" +
      "<NAVIGATIONELEMENTS COUNT=\"1\">\n" +
      "<NAVIGATIONELEMENT _key=\"x\" _nsubrecs=\"3\" />\n" +
      "</NAVIGATIONELEMENTS>\n</NAVIGATIONENTRY>\n" +
      "</RESULTPAGE>\n</SEGMENT>\n</SEGMENTS>\n"
    assert(got == want, got)
  }

  test("xml HIT numbering starts at offset+1; vectors join with ', '") {
    val df = Seq((Seq("a", "b"), 7)).toDF("tags", "n")
    val got = CommandFormat.xml(df, nHits = 12, offset = 5, limit = 1)
    assert(got.contains("<RESULTSET OFFSET=\"5\" LIMIT=\"1\" NHITS=\"12\">"), got)
    assert(got.contains("<HIT NO=\"6\">"), got)
    assert(got.contains("<FIELD NAME=\"tags\">a, b</FIELD>"), got)
  }

  test("rangeNormalize replicates grn_output_range_normalize") {
    import CommandFormat.rangeNormalize
    assert(rangeNormalize(10, 0, -1) == (0, 10))   // limit -1 = all
    assert(rangeNormalize(10, 0, 99) == (0, 10))   // clamp to size
    assert(rangeNormalize(10, -3, 5) == (7, 3))    // offset from end, end-clamped
    assert(rangeNormalize(10, 12, 5) == (0, 0))    // too-large offset
    assert(rangeNormalize(10, 0, -20) == (0, 0))   // too-small limit
    assert(rangeNormalize(10, 8, 5) == (8, 2))     // end clamp
  }
}
