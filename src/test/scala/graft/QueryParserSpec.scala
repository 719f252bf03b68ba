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
}
