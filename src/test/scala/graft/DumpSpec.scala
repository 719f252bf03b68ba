package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Dump
import graft.index.{IndexBuilder, IndexConfig}

/** dump command-script goldens — the NO_KEY + lexicon + index-column shape
  * transcribed from the reference's dump/record/lexicon.expected, plus the
  * keyed-table and escaping edges. */
class DumpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reference golden shape: NO_KEY table, lexicon, load block, index column last") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dump").toString
    val docs = Seq((1L, "Groonga is fast!")).toDF("doc_id", "content")
    val idx = IndexBuilder.build(spark, docs, "doc_id", "content",
      s"$tmp/idx", IndexConfig(bucketBits = 4))
    val got = Dump.commandScript(docs.select("content"), "Memos",
      index = Some(idx), indexSourceCols = Seq("content")).toList
    val want = List(
      "table_create Memos TABLE_NO_KEY",
      "column_create Memos content COLUMN_SCALAR ShortText",
      "",
      "table_create Terms TABLE_PAT_KEY ShortText " +
        "--default_tokenizer TokenBigram --normalizer NormalizerAuto",
      "",
      "load --table Memos",
      "[",
      "[\"_id\",\"content\"],",
      "[1,\"Groonga is fast!\"]",
      "]",
      "",
      "column_create Terms memos_content_index COLUMN_INDEX|WITH_POSITION Memos content")
    assert(got == want)
  }

  test("keyed table: TABLE_HASH_KEY, rows sorted by key, _key header") {
    val df = Seq((3, "c", 1.5), (1, "a", 0.5), (2, "b", 2.0))
      .toDF("k", "name", "score")
    val got = Dump.commandScript(df, "T", keyCol = Some("k")).toList
    assert(got.head == "table_create T TABLE_HASH_KEY Int32")
    assert(got.contains("column_create T name COLUMN_SCALAR ShortText"))
    assert(got.contains("column_create T score COLUMN_SCALAR Float"))
    val body = got.dropWhile(_ != "[").drop(1).takeWhile(_ != "]")
    assert(body == List(
      "[\"_key\",\"name\",\"score\"],",
      "[1,\"a\",0.5],",
      "[2,\"b\",2.0],",
      "[3,\"c\",1.5]"))
  }

  test("sectioned index dumps WITH_SECTION and the section columns") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dump2").toString
    val docs = Seq((1L, "t one", "b one")).toDF("doc_id", "title", "body")
    val idx = IndexBuilder.buildSectioned(spark, docs, "doc_id",
      Seq("title", "body"), s"$tmp/idx", IndexConfig(bucketBits = 4))
    val lines = Dump.commandScript(docs, "Docs", keyCol = Some("doc_id"),
      index = Some(idx)).toList
    assert(lines.last ==
      "column_create Terms docs_title_body_index " +
        "COLUMN_INDEX|WITH_POSITION|WITH_SECTION Docs title body")
    assert(lines.head == "table_create Docs TABLE_HASH_KEY Int64")
  }

  test("JSON escaping and vector columns") {
    val df = Seq((1, "a\"b\\c\nd", Seq(1.5f, 2.0f))).toDF("k", "s", "v")
    val lines = Dump.commandScript(df, "E", keyCol = Some("k")).toList
    assert(lines.contains("column_create E v COLUMN_VECTOR Float"))
    assert(lines.contains("[1,\"a\\\"b\\\\c\\nd\",[1.5,2.0]]"))
  }
}
