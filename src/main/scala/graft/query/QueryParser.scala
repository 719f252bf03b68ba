package graft.query

/** Groonga query-syntax parser (subset) — the `--query` Google-like grammar
  * (parse_query, /root/reference/lib/expr.c:4962-5500):
  *
  *   term            full-text match (combined with the default operator)
  *   +a              force AND
  *   -a              AND NOT
  *   a OR b          disjunction
  *   "a b"           phrase
  *   ( ... )         grouping
  *   col:@word       match in an explicit column (v1: routed to the index)
  *   col:^pre        prefix search
  *   term*W          weight W on a term leg
  *
  * Default connective between adjacent legs is AND (GRN_OP_AND,
  * /root/reference/lib/expr.c:4533-4542 default-op handling).
  */
object QueryParser {

  sealed trait Node
  final case class TermQ(term: String, weight: Double = 1.0) extends Node
  final case class PhraseQ(phrase: String) extends Node
  final case class PrefixQ(prefix: String) extends Node
  final case class AndQ(l: Node, r: Node) extends Node
  final case class OrQ(l: Node, r: Node) extends Node
  /** l AND NOT r */
  final case class NotQ(l: Node, r: Node) extends Node

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object OrTok extends Tok
  private final case class Leg(text: String, plus: Boolean, minus: Boolean) extends Tok

  private def lex(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < q.length) {
      q.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '"' =>
          val j = q.indexOf('"', i + 1)
          val end = if (j < 0) q.length else j
          out += Leg("\"" + q.substring(i + 1, end) + "\"", plus = false, minus = false)
          i = end + 1
        case c =>
          var plus = false
          var minus = false
          var k = i
          if (c == '+') { plus = true; k += 1 }
          else if (c == '-') { minus = true; k += 1 }
          if (k < q.length && q.charAt(k) == '"') {
            val j = q.indexOf('"', k + 1)
            val end = if (j < 0) q.length else j
            out += Leg("\"" + q.substring(k + 1, end) + "\"", plus, minus)
            i = end + 1
          } else {
            var e = k
            while (e < q.length && !q.charAt(e).isWhitespace &&
              q.charAt(e) != '(' && q.charAt(e) != ')') e += 1
            val word = q.substring(k, e)
            if (word == "OR") out += OrTok
            else if (word.nonEmpty) out += Leg(word, plus, minus)
            i = e
          }
      }
    }
    out.toList
  }

  private def leaf(text: String): Node = {
    if (text.startsWith("\"") && text.endsWith("\"") && text.length >= 2)
      PhraseQ(text.substring(1, text.length - 1))
    else {
      // col:@word / col:^pre — v1 ignores the column name (single indexed
      // text column); bare ^pre also accepted
      val body = text.indexOf(':') match {
        case -1 => text
        case ci => text.substring(ci + 1)
      }
      val (op, rest) =
        if (body.startsWith("@")) ('@', body.drop(1))
        else if (body.startsWith("^")) ('^', body.drop(1))
        else (' ', body)
      val (core, weight) = rest.lastIndexOf('*') match {
        case -1 => (rest, 1.0)
        case wi if wi > 0 && rest.drop(wi + 1).forall(_.isDigit) && rest.drop(wi + 1).nonEmpty =>
          (rest.take(wi), rest.drop(wi + 1).toDouble)
        case _ => (rest, 1.0)
      }
      op match {
        case '^' => PrefixQ(core)
        case _ => TermQ(core, weight)
      }
    }
  }

  /** parse; throws IllegalArgumentException on malformed input */
  def parse(q: String): Node = {
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
      var neg: Boolean = false
      def unitAvailable: Boolean = peek.exists {
        case OrTok | RParen => false
        case _ => true
      }
      while (unitAvailable) {
        val (node, minus) = parseUnit()
        if (n == null) {
          if (minus) throw new IllegalArgumentException("query cannot start with -")
          n = node
        } else if (minus) n = NotQ(n, node)
        else n = AndQ(n, node)
        neg = false
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
      case Leg(text, _, minus) => (leaf(text), minus)
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    val n = parseExpr()
    if (toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens: $toks")
    n
  }
}
