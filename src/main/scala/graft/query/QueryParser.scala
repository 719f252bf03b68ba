package graft.query

/** Groonga query-syntax parser — the `--query` Google-like grammar
  * (parse_query, /root/reference/lib/expr.c:4962-5500):
  *
  *   term            full-text match (combined with the default operator)
  *   +a              force AND
  *   -a              AND NOT
  *   a OR b          disjunction
  *   "a b"           phrase
  *   ( ... )         grouping
  *   col:@word       full-text match in an explicit column
  *   col:^pre        prefix search
  *   col:$suf        suffix search (reversed-term dictionary)
  *   col:~pattern    regexp over the dictionary
  *   col:<n col:<=n col:>n col:>=n col:!v col:=v col:v
  *                   relational / equality predicates on a scalar column
  *   term*W          weight W on a term leg
  *   \x              escapes x anywhere (quote, colon, operator chars)
  *
  * Default connective between adjacent legs is AND (GRN_OP_AND,
  * /root/reference/lib/expr.c:4533-4542 default-op handling).
  */
object QueryParser {

  sealed trait Node
  final case class TermQ(term: String, weight: Double = 1.0) extends Node
  final case class PhraseQ(phrase: String) extends Node
  final case class PrefixQ(prefix: String) extends Node
  final case class SuffixQ(suffix: String) extends Node
  final case class RegexpQ(pattern: String) extends Node
  /** relational predicate on a scalar column; op ∈ {<, <=, >, >=, =, !=} */
  final case class RelQ(col: String, op: String, value: String) extends Node
  final case class AndQ(l: Node, r: Node) extends Node
  final case class OrQ(l: Node, r: Node) extends Node
  /** l AND NOT r */
  final case class NotQ(l: Node, r: Node) extends Node
  /** the whole record set (score 0) — only produced for a leading NOT
    * under ALLOW_LEADING_NOT, where `-a` means "all records AND-NOT a"
    * (grn_expr query flag QUERY_ALLOW_LEADING_NOT, lib/expr.c) */
  case object AllQ extends Node

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object OrTok extends Tok
  /** `text` keeps backslash escapes (resolved in leaf(), AFTER operator
    * chars are recognized, so \: et al stay literal) */
  private final case class Leg(text: String, plus: Boolean, minus: Boolean,
      quoted: Boolean) extends Tok

  private def lex(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0

    def quotedLeg(from: Int, plus: Boolean, minus: Boolean): Int = {
      // from points at the opening quote; honor \" inside
      val sb = new StringBuilder
      var k = from + 1
      var closed = false
      while (k < q.length && !closed) {
        val c = q.charAt(k)
        if (c == '\\' && k + 1 < q.length) { sb.append('\\').append(q.charAt(k + 1)); k += 2 }
        else if (c == '"') { closed = true; k += 1 }
        else { sb.append(c); k += 1 }
      }
      out += Leg(sb.toString, plus, minus, quoted = true)
      k
    }

    while (i < q.length) {
      q.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '"' => i = quotedLeg(i, plus = false, minus = false)
        case c =>
          var plus = false
          var minus = false
          var k = i
          if (c == '+') { plus = true; k += 1 }
          else if (c == '-') { minus = true; k += 1 }
          if (k < q.length && q.charAt(k) == '"') {
            i = quotedLeg(k, plus, minus)
          } else {
            val sb = new StringBuilder
            var e = k
            var stop = false
            while (e < q.length && !stop) {
              val ch = q.charAt(e)
              if (ch == '\\' && e + 1 < q.length) { sb.append('\\').append(q.charAt(e + 1)); e += 2 }
              else if (ch.isWhitespace || ch == '(' || ch == ')') stop = true
              else { sb.append(ch); e += 1 }
            }
            val word = sb.toString
            if (word == "OR") out += OrTok
            else if (word.nonEmpty) out += Leg(word, plus, minus, quoted = false)
            i = e
          }
      }
    }
    out.toList
  }

  /** resolve backslash escapes to their literal char */
  private def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** index of the first UNESCAPED ':' (or -1) */
  private def colonIndex(s: String): Int = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == ':') return i
      else i += 1
    }
    -1
  }

  private def parseWeight(rest: String): (String, Double) =
    rest.lastIndexOf('*') match {
      case -1 => (rest, 1.0)
      case wi if wi > 0 && (wi == 0 || rest.charAt(wi - 1) != '\\') &&
          rest.drop(wi + 1).nonEmpty && rest.drop(wi + 1).forall(_.isDigit) =>
        (rest.take(wi), rest.drop(wi + 1).toDouble)
      case _ => (rest, 1.0)
    }

  private def opLeaf(col: String, body: String): Node = {
    require(body.nonEmpty, s"empty value after '$col:'")
    def rest1 = unescape(body.drop(1))
    def rest2 = unescape(body.drop(2))
    body.charAt(0) match {
      case '@' =>
        val (core, w) = parseWeight(body.drop(1))
        TermQ(unescape(core), w)
      case '^' => PrefixQ(rest1)
      case '$' => SuffixQ(rest1)
      case '~' => RegexpQ(rest1)
      case '<' => if (body.startsWith("<=")) RelQ(col, "<=", rest2) else RelQ(col, "<", rest1)
      case '>' => if (body.startsWith(">=")) RelQ(col, ">=", rest2) else RelQ(col, ">", rest1)
      case '!' => RelQ(col, "!=", rest1)
      case '=' => RelQ(col, "=", rest1)
      case _ => RelQ(col, "=", unescape(body)) // groonga: col:value is equality
    }
  }

  private def leaf(l: Leg): Node = {
    if (l.quoted) return PhraseQ(unescape(l.text))
    val text = l.text
    colonIndex(text) match {
      case ci if ci > 0 =>
        opLeaf(unescape(text.take(ci)), text.substring(ci + 1))
      case 0 => throw new IllegalArgumentException(s"missing column name in '$text'")
      case _ =>
        // bare leg: ^pre / $suf / ~pat also accepted without a column
        if (text.startsWith("^")) PrefixQ(unescape(text.drop(1)))
        else if (text.startsWith("$")) SuffixQ(unescape(text.drop(1)))
        else if (text.startsWith("~")) RegexpQ(unescape(text.drop(1)))
        else {
          val (core, weight) = parseWeight(text)
          TermQ(unescape(core), weight)
        }
    }
  }

  /** parse; throws IllegalArgumentException on malformed input */
  def parse(q: String): Node = parse(q, allowLeadingNot = false)

  /** `allowLeadingNot` = the reference's QUERY_ALLOW_LEADING_NOT flag:
    * a group may start with `-x`, meaning all records AND-NOT x; off (the
    * reference default) a leading minus is a syntax error. */
  def parse(q: String, allowLeadingNot: Boolean): Node = {
    var toks = lex(q)
    def peek: Option[Tok] = toks.headOption
    def advance(): Tok = { val t = toks.head; toks = toks.tail; t }

    // expr := seq (OR seq)*   — OR binds loosest
    // seq  := unit+           — adjacency folds left with AND / AND-NOT
    def parseExpr(): Node = {
      var n = parseSeq()
      while (peek.contains(OrTok)) { advance(); n = OrQ(n, parseSeq()) }
      n
    }
    def parseSeq(): Node = {
      var n: Node = null
      def unitAvailable: Boolean = peek.exists {
        case OrTok | RParen => false
        case _ => true
      }
      while (unitAvailable) {
        val (node, minus) = parseUnit()
        if (n == null) {
          if (minus) {
            if (!allowLeadingNot) throw new IllegalArgumentException(
              "query cannot start with - (set allowLeadingNot / " +
                "QUERY_ALLOW_LEADING_NOT to mean: all records AND-NOT this)")
            n = NotQ(AllQ, node)
          } else n = node
        } else if (minus) n = NotQ(n, node)
        else n = AndQ(n, node)
      }
      if (n == null) throw new IllegalArgumentException("empty query group")
      n
    }
    def parseUnit(): (Node, Boolean) = advance() match {
      case LParen =>
        val n = parseExpr()
        if (!peek.contains(RParen)) throw new IllegalArgumentException("missing )")
        advance()
        (n, false)
      case l @ Leg(_, _, minus, _) => (leaf(l), minus)
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    val n = parseExpr()
    if (toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens: $toks")
    n
  }
}
