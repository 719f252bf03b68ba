package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.StringProcs._

/** string_* proc goldens transcribed from the reference's own test suite
  * (test/command/suite/select/function/string/...) — ascii, multibyte,
  * negative-from, out-of-range, default_value and omission edges. */
class StringProcsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(c: Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.cast("string")).head().getString(0)
  }
  private def g: Column = lit("Groonga")
  private def mb: Column = lit("ぐるんが")

  test("string_length counts characters (reference string_length/*.test)") {
    assert(one(stringLength(g)) == "7")
    assert(one(stringLength(mb)) == "4")
    assert(one(stringLength(lit(""))) == "0")
  }

  test("string_substring: ascii/multibyte/without_length/from_negative/from_large") {
    assert(one(stringSubstring(g, lit(0), lit(2))) == "Gr")       // ascii.test
    assert(one(stringSubstring(mb, lit(2), lit(3))) == "んが")    // multibyte.test
    assert(one(stringSubstring(g, lit(2), lit(-1))) == "oonga")   // without_length.test
    assert(one(stringSubstring(g, lit(-3), lit(-1))) == "nga")    // from_negative.test
    assert(one(stringSubstring(g, lit(10), lit(-1))) == "")       // from_large.test
    // the reference's repeated `from += len` wrap: -10 +7 +7 -> 4 -> "ng"
    assert(one(stringSubstring(g, lit(-10), lit(2))) == "ng")
  }

  test("string_substring default_value: from/zero_length/empty_target") {
    val d = lit("default")
    assert(one(stringSubstring(g, lit(10), lit(-1), d)) == "default")
    assert(one(stringSubstring(g, lit(10), lit(2), d)) == "default")
    // zero length returns "" WITHOUT default substitution (string.c:212)
    assert(one(stringSubstring(g, lit(2), lit(0), d)) == "")
    assert(one(stringSubstring(lit(""), lit(1), lit(1), d)) == "default")
  }

  test("string_truncate: truncate/just/negative/multibyte/short/omission") {
    assert(one(stringTruncate(g, lit(6))) == "Gro...")
    assert(one(stringTruncate(g, lit(7))) == "Groonga")
    assert(one(stringTruncate(g, lit(8))) == "Groonga")
    assert(one(stringTruncate(g, lit(-3))) == "...")
    assert(one(stringTruncate(lit("ぐるんがですか。"), lit(6))) == "ぐるん...")
    assert(one(stringTruncate(lit("gr"), lit(2))) == "gr")
    // omission longer than length -> omission alone (string.c:309-316 note)
    assert(one(stringTruncate(lit("gr"), lit(1))) == "...")
    assert(one(stringTruncate(g, lit(4), lit("**"))) == "Gr**")
    assert(one(stringTruncate(g, lit(4), lit(""))) == "Groo")
  }

  test("string_slice numeric: one char default length, negative from, default_value") {
    assert(one(stringSlice(g, lit(2))) == "o")
    assert(one(stringSlice(mb, lit(2))) == "ん")
    assert(one(stringSlice(mb, lit(1), lit(3))) == "るんが")
    assert(one(stringSlice(g, lit(-3))) == "n")
    assert(one(stringSlice(g, lit(-3), lit(3))) == "nga")
    assert(one(stringSubstring(g, lit(10), lit(1), lit("default"))) == "default")
  }

  test("string_slice regexp: nth, nth 0, named groups, mismatch -> default") {
    assert(one(stringSliceRegexp(g, "(roon)(g)", 2)) == "g")
    assert(one(stringSliceRegexp(g, "Groonga", 0)) == "Groonga")
    assert(one(stringSliceRegexp(lit("ぐるんが"), "ぐ(る)(んが)", 2)) == "んが")
    assert(one(stringSliceRegexp(g, "(Gr)(?<Name1>o*)(?<Name2>.*)", "Name1",
      lit("default"))) == "oo")
    assert(one(stringSliceRegexp(g, "(Gr)(?<Name1>o*)(?<Name2>.*)", "Name3",
      lit("default"))) == "default")
    assert(one(stringSliceRegexp(g, "mismatch", 2, lit("default"))) == "default")
    // out-of-range group index takes the default (nth >= num_regs path)
    assert(one(stringSliceRegexp(g, "(o+)", 5, lit("default"))) == "default")
  }

  test("namedGroupIndex: counts only capturing groups before the name") {
    assert(namedGroupIndex("(a)(?<x>b)", "x") == 2)
    assert(namedGroupIndex("(?:a)(?<x>b)", "x") == 1)
    assert(namedGroupIndex("(?=a)(?<y>b)(?<x>c)", "x") == 2)
    assert(namedGroupIndex("(a)(b)", "x") == -1)
    assert(namedGroupIndex("\\((?<x>b)", "x") == 1)
  }

  test("string_tokenize: analyzer token vector in stream order") {
    import spark.implicits._
    val got = Seq("Hello World  of search").toDF("t")
      .select(stringTokenize(col("t"), "TokenBigram"))
      .head().getSeq[String](0)
    assert(got == Seq("hello", "world", "of", "search"))
    val dl = Seq("a b  c").toDF("t")
      .select(stringTokenize(col("t"), "TokenDelimit"))
      .head().getSeq[String](0)
    assert(dl == Seq("a", "b", "c"))
  }
}
