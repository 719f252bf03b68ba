package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }

  test("graft_tokenize generator works from SQL (LATERAL VIEW)") {
    import spark.implicits._
    Seq((1L, "spark 日本語 search")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val rows = spark.sql(
      """SELECT id, t.pos, t.term FROM ext_docs
        |LATERAL VIEW graft_tokenize(text) t AS pos, term, status
        |ORDER BY pos""".stripMargin).collect()
    assert(rows.map(r => (r.getInt(1), r.getString(2))).toSeq ==
      Seq((0, "spark"), (1, "日本"), (2, "本語"), (3, "語"), (4, "search")))
  }

  test("tokenizer argument selects the analyzer") {
    import spark.implicits._
    Seq(Tuple1("a b")).toDF("text").createOrReplaceTempView("ext_docs2")
    val rows = spark.sql(
      """SELECT t.term FROM ext_docs2
        |LATERAL VIEW graft_tokenize(text, 'TokenBigramSplitSymbolAlpha') t AS pos, term, status
        |ORDER BY t.pos""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("poly_hash / shingle_hash from SQL equal the Scala fold") {
    val h = spark.sql("SELECT poly_hash('spark'), shingle_hash('spark')").head()
    def ref(s: String, m: Long): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * m + c) % 1000000007L)
    assert(h.getLong(0) == ref("spark", 131))
    assert(h.getLong(1) == ref("spark", 31))
  }
}
