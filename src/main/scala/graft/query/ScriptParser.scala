package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** groonga script-syntax `--filter` strings compiled to Catalyst Columns.
  *
  * Covers the expression subset of the reference grammar
  * (/root/reference/lib/grn_ecmascript.lemon:209-715) that a filter can
  * contain: `||`, `&&`, `&!` (and-not), comparisons, the match operators
  * `@` (contains) / `@^` (prefix) / `@$` (suffix) / `@~` (regexp),
  * arithmetic, unary !/-, parentheses, string/number/bool/null literals,
  * column identifiers (dotted paths allowed), and function calls resolved
  * through a registry (between / in_values / edit_distance / length / now
  * by default — the reference proc set, lib/proc/).
  *
  * The engine mapping is deliberately thin: parsing produces a Column tree
  * and Catalyst does the rest (predicate pushdown, codegen), which is the
  * Spark-native analogue of the reference compiling filters to its
  * expression VM.
  */
object ScriptParser {

  type FnRegistry = Map[String, Seq[Column] => Column]

  /** groonga between(value, min, min_border, max, max_border)
    * (lib/proc/proc_between.c): borders are "include"/"exclude" literals.
    * Border args arrive as string-literal Columns; we re-read them from the
    * source text instead, so the registry stays (Seq[Column] => Column). */
  private def betweenFn(args: Seq[(Column, Option[String])]): Column = {
    require(args.length == 5,
      s"between() takes (value, min, min_border, max, max_border), got ${args.length} args")
    val v = args.head._1
    def border(b: Option[String]): Boolean = b match {
      case Some("include") => true
      case Some("exclude") => false
      case other => throw new IllegalArgumentException(
        s"between() border must be 'include' or 'exclude' literal, got $other")
    }
    val lo = if (border(args(2)._2)) v >= args(1)._1 else v > args(1)._1
    val hi = if (border(args(4)._2)) v <= args(3)._1 else v < args(3)._1
    lo && hi
  }

  val defaultFunctions: FnRegistry = Map(
    "in_values" -> (args => args.head.isin(args.tail: _*)),
    "edit_distance" -> (args => levenshtein(args(0), args(1))),
    "length" -> (args => length(args.head)),
    "now" -> (_ => current_timestamp()))

  /** compile a filter script to a Column. `resolve` maps identifiers to
    * Columns (default: unresolved col(name), bound by Spark at analysis). */
  def compile(src: String, resolve: String => Column = col,
      functions: FnRegistry = defaultFunctions): Column =
    new P(src, resolve, functions).parseAll()

  // ---- recursive descent ---------------------------------------------------

  private final class P(src: String, resolve: String => Column, fns: FnRegistry) {
    private var pos = 0

    def parseAll(): Column = {
      val c = orExpr()._1
      skipWs()
      if (pos < src.length) fail(s"unexpected trailing input at $pos: '${src.substring(pos)}'")
      c
    }

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"filter script parse error: $msg in <$src>")

    private def skipWs(): Unit =
      while (pos < src.length && Character.isWhitespace(src.charAt(pos))) pos += 1

    private def eat(tok: String): Boolean = {
      skipWs()
      if (src.startsWith(tok, pos)) { pos += tok.length; true } else false
    }
    private def peek(tok: String): Boolean = { skipWs(); src.startsWith(tok, pos) }

    /** (column, string-literal source if the node was a plain string) */
    private type Node = (Column, Option[String])

    private def orExpr(): Node = {
      var l = andExpr()
      while (peek("||")) { eat("||"); l = (l._1 || andExpr()._1, None) }
      l
    }

    private def andExpr(): Node = {
      var l = cmpExpr()
      var go = true
      while (go) {
        if (peek("&&")) { eat("&&"); l = (l._1 && cmpExpr()._1, None) }
        else if (peek("&!")) { eat("&!"); l = (l._1 && !cmpExpr()._1, None) }
        else go = false
      }
      l
    }

    private def cmpExpr(): Node = {
      val l = addExpr()
      // multi-char operators first (@^ before @, <= before <)
      if (eat("==")) (l._1 === addExpr()._1, None)
      else if (eat("!=")) (l._1 =!= addExpr()._1, None)
      else if (eat("<=")) (l._1 <= addExpr()._1, None)
      else if (eat(">=")) (l._1 >= addExpr()._1, None)
      else if (eat("@^")) (l._1.startsWith(addExpr()._1), None)
      else if (eat("@$")) (l._1.endsWith(addExpr()._1), None)
      else if (eat("@~")) (l._1.rlike(stringArg("@~")), None)
      else if (eat("@")) (l._1.contains(addExpr()._1), None)
      else if (eat("<")) (l._1 < addExpr()._1, None)
      else if (eat(">")) (l._1 > addExpr()._1, None)
      else l
    }

    /** @~ needs the pattern as a literal string (rlike takes a String) */
    private def stringArg(op: String): String = {
      val r = addExpr()
      r._2.getOrElse(fail(s"$op requires a string literal pattern"))
    }

    private def addExpr(): Node = {
      var l = mulExpr()
      var go = true
      while (go) {
        skipWs()
        if (peek("+")) { eat("+"); l = (l._1 + mulExpr()._1, None) }
        // '-' only when not part of a literal handled in unary
        else if (peek("-")) { eat("-"); l = (l._1 - mulExpr()._1, None) }
        else go = false
      }
      l
    }

    private def mulExpr(): Node = {
      var l = unary()
      var go = true
      while (go) {
        if (peek("*")) { eat("*"); l = (l._1 * unary()._1, None) }
        else if (peek("%")) { eat("%"); l = (l._1 % unary()._1, None) }
        else if (peek("/") && !peek("//")) { eat("/"); l = (l._1 / unary()._1, None) }
        else go = false
      }
      l
    }

    private def unary(): Node = {
      skipWs()
      if (eat("!")) (!unary()._1, None)
      else if (eat("-")) (negate(unary()._1), None)
      else primary()
    }

    private def negate(c: Column): Column = lit(0) - c

    private def primary(): Node = {
      skipWs()
      if (pos >= src.length) fail("unexpected end of input")
      val c = src.charAt(pos)
      if (c == '(') {
        pos += 1
        val e = orExpr()
        skipWs()
        if (!eat(")")) fail(s"missing ')' at $pos")
        (e._1, e._2)
      } else if (c == '"' || c == '\'') stringLit(c)
      else if (Character.isDigit(c)) numberLit()
      else if (Character.isJavaIdentifierStart(c)) identOrCall()
      else fail(s"unexpected char '$c' at $pos")
    }

    private def stringLit(quote: Char): Node = {
      pos += 1
      val sb = new java.lang.StringBuilder()
      while (pos < src.length && src.charAt(pos) != quote) {
        val ch = src.charAt(pos)
        if (ch == '\\' && pos + 1 < src.length) {
          pos += 1
          sb.append(src.charAt(pos) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case other => other // \" \' \\ and any other escaped char literally
          })
        } else sb.append(ch)
        pos += 1
      }
      if (pos >= src.length) fail("unterminated string literal")
      pos += 1
      val s = sb.toString
      (lit(s), Some(s))
    }

    private def numberLit(): Node = {
      val start = pos
      while (pos < src.length && (Character.isDigit(src.charAt(pos)) ||
        src.charAt(pos) == '.')) pos += 1
      val s = src.substring(start, pos)
      if (s.contains('.')) (lit(s.toDouble), None) else (lit(s.toLong), None)
    }

    private def identOrCall(): Node = {
      val start = pos
      while (pos < src.length && (Character.isJavaIdentifierPart(src.charAt(pos)) ||
        src.charAt(pos) == '.')) pos += 1
      val name = src.substring(start, pos)
      name match {
        case "true" => (lit(true), None)
        case "false" => (lit(false), None)
        case "null" => (lit(null), None)
        case _ =>
          skipWs()
          if (pos < src.length && src.charAt(pos) == '(') {
            pos += 1
            val args = scala.collection.mutable.ArrayBuffer.empty[Node]
            skipWs()
            if (!eat(")")) {
              args += orExpr()
              while (eat(",")) args += orExpr()
              if (!eat(")")) fail(s"missing ')' in call to $name")
            }
            if (name == "between") (betweenFn(args.toSeq), None)
            else fns.get(name) match {
              case Some(f) => (f(args.map(_._1).toSeq), None)
              case None => fail(s"unknown function '$name' " +
                s"(registered: between, ${fns.keys.toSeq.sorted.mkString(", ")})")
            }
          } else (resolve(name), None)
      }
    }
  }
}
