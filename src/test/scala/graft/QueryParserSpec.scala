package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query.QueryParser
import graft.query.QueryParser._

class QueryParserSpec extends AnyFunSuite {

  test("adjacency folds to AND") {
    assert(QueryParser.parse("a b") == AndQ(TermQ("a"), TermQ("b")))
    assert(QueryParser.parse("a +b") == AndQ(TermQ("a"), TermQ("b")))
  }

  test("minus folds to AND NOT") {
    assert(QueryParser.parse("a -b") == NotQ(TermQ("a"), TermQ("b")))
    assert(QueryParser.parse("a b -c") ==
      NotQ(AndQ(TermQ("a"), TermQ("b")), TermQ("c")))
  }

  test("OR binds loosest") {
    assert(QueryParser.parse("a b OR c") ==
      OrQ(AndQ(TermQ("a"), TermQ("b")), TermQ("c")))
  }

  test("phrase and parens") {
    assert(QueryParser.parse("\"x y\" z") == AndQ(PhraseQ("x y"), TermQ("z")))
    assert(QueryParser.parse("a (b OR c)") ==
      AndQ(TermQ("a"), OrQ(TermQ("b"), TermQ("c"))))
  }

  test("column ops and weights") {
    assert(QueryParser.parse("text:@word") == TermQ("word"))
    assert(QueryParser.parse("text:^pre") == PrefixQ("pre"))
    assert(QueryParser.parse("boost*5") == TermQ("boost", 5.0))
  }

  test("malformed queries throw") {
    intercept[IllegalArgumentException](QueryParser.parse("-a"))
    intercept[IllegalArgumentException](QueryParser.parse("(a"))
    intercept[IllegalArgumentException](QueryParser.parse(""))
  }

  test("relational column predicates") {
    assert(QueryParser.parse("n:<40") == RelQ("n", "<", "40"))
    assert(QueryParser.parse("n:<=40") == RelQ("n", "<=", "40"))
    assert(QueryParser.parse("n:>40") == RelQ("n", ">", "40"))
    assert(QueryParser.parse("n:>=40") == RelQ("n", ">=", "40"))
    assert(QueryParser.parse("lang:!en") == RelQ("lang", "!=", "en"))
    assert(QueryParser.parse("lang:=en") == RelQ("lang", "=", "en"))
    assert(QueryParser.parse("lang:en") == RelQ("lang", "=", "en"))
    assert(QueryParser.parse("a +n:<40") == AndQ(TermQ("a"), RelQ("n", "<", "40")))
  }

  test("suffix and regexp legs") {
    assert(QueryParser.parse("text:$ing") == SuffixQ("ing"))
    assert(QueryParser.parse("$ing") == SuffixQ("ing"))
    assert(QueryParser.parse("text:~qu.*y") == RegexpQ("qu.*y"))
    assert(QueryParser.parse("~qu.*y") == RegexpQ("qu.*y"))
  }

  test("escapes make operator chars literal") {
    assert(QueryParser.parse("a\\:b") == TermQ("a:b"))
    assert(QueryParser.parse("\\-lead") == TermQ("-lead"))
    assert(QueryParser.parse("w\\*2") == TermQ("w*2"))
    assert(QueryParser.parse("col:\\<x") == RelQ("col", "=", "<x"))
    assert(QueryParser.parse("\"a \\\" b\"") == PhraseQ("a \" b"))
  }

  test("empty column value errors instead of mis-parsing") {
    intercept[IllegalArgumentException](QueryParser.parse("col:"))
    intercept[IllegalArgumentException](QueryParser.parse(":foo"))
  }

  test("match_columns string parses to column weights") {
    import graft.query.MatchColumns
    assert(MatchColumns.parse("title * 10 || text") ==
      Map("title" -> 10.0, "text" -> 1.0))
    assert(MatchColumns.parse("body") == Map("body" -> 1.0))
    assert(MatchColumns.parse("Idx.title*2.5||body") ==
      Map("title" -> 2.5, "body" -> 1.0))
    intercept[IllegalArgumentException](MatchColumns.parse(""))
    intercept[IllegalArgumentException](MatchColumns.parse("a * x"))
    intercept[IllegalArgumentException](MatchColumns.parse("a || "))
    intercept[IllegalArgumentException](MatchColumns.parse("a * 2 * 3"))
  }

  test("leading NOT: error by default, all-AND-NOT under the flag") {
    intercept[IllegalArgumentException](QueryParser.parse("-a b"))
    assert(QueryParser.parse("-a", allowLeadingNot = true) ==
      NotQ(AllQ, TermQ("a")))
    assert(QueryParser.parse("-a b", allowLeadingNot = true) ==
      AndQ(NotQ(AllQ, TermQ("a")), TermQ("b")))
    // non-leading minus is plain AND-NOT, flag or not
    assert(QueryParser.parse("a -b", allowLeadingNot = true) ==
      NotQ(TermQ("a"), TermQ("b")))
  }
}
