package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.analyzer.{Analyzers, Tokenizer}

/** The reference's `string_*` proc family
  * (/root/reference/plugins/functions/string.c) re-expressed as Column
  * functions with the reference's CHARACTER-unit semantics (groonga counts
  * UTF-8 characters, never bytes, in all of these — Spark's string
  * functions are also character-based, which is what makes the direct
  * mapping sound):
  *
  *  - `string_length(target)` — number of characters
  *    (func_string_length, string.c:48).
  *  - `string_substring(target, from[, length][, default])` — 0-based
  *    `from`; negative `from` wraps modulo the character length (the
  *    reference adds the length REPEATEDLY until non-negative —
  *    string.c:216: `while (from < 0) from += len`); `length < 0` means
  *    to-end; `length == 0` is the empty string WITHOUT default
  *    substitution (string.c:212 returns before the default logic); an
  *    empty/out-of-range result substitutes `default` (string.c:267-281).
  *  - `string_truncate(target, length[, omission="..."])` — Rails-style:
  *    over-long strings keep `length - chars(omission)` characters (min 0)
  *    and append `omission`; `length < 0` yields `omission` alone
  *    (func_string_truncate, string.c:318; note at :309-316).
  *  - `string_slice(target, nth_from[, length][, default])` — numeric form:
  *    substring with `length` defaulting to 1 (func_string_slice,
  *    string.c:698-733).
  *  - `string_slice(target, pattern, group[, default])` — regexp form: the
  *    requested capture group (by index or name) of the FIRST match;
  *    no match / out-of-range group yields `default`, but an empty MATCHED
  *    group is returned as "" without default substitution
  *    (string_regexp_slice, string.c:544-692 — only a null result takes
  *    the default, an empty bulk does not).
  *  - `string_tokenize(target, analyzer)` — the token vector produced by a
  *    named analyzer (func_string_tokenize, string.c:436; the lexicon
  *    argument's tokenizer+normalizer+filters are our analyzer spec
  *    string, the same round-trippable names the index manifest uses).
  */
object StringProcs {

  def stringLength(target: Column): Column = length(target).cast("int")

  /** 0-based, character-unit substring with groonga's negative-wrap and
    * default-substitution rules. `len < 0` = to end. */
  def stringSubstring(target: Column, from: Column, len: Column,
      default: Column = lit("")): Column = {
    val n = length(target)
    // `while (from < 0) from += n` == positive modulo (pmod); guard n = 0
    // (the empty-target path goes straight to the default)
    val f = when(from < 0, pmod(from, greatest(n, lit(1)))).otherwise(from)
    // character-based substring; to-end via the max char count (Spark
    // clamps internally); from beyond the last char yields ""
    val sub = substring(target, (f + 1).cast("int"),
      when(len < 0, n).otherwise(len).cast("int"))
    when(length(target) === 0, default)
      .when(len === 0, lit(""))
      .when(length(sub) === 0, default)
      .otherwise(sub)
  }

  /** Rails-String#truncate semantics (string.c:309-436). */
  def stringTruncate(target: Column, maxChars: Column,
      omission: Column = lit("...")): Column = {
    val keep = greatest(maxChars - length(omission), lit(0))
    when(maxChars < 0, omission)
      .when(length(target) <= maxChars, target)
      .otherwise(concat(substring(target, lit(1), keep.cast("int")), omission))
  }

  /** numeric string_slice: one character at `from` unless `len` given */
  def stringSlice(target: Column, from: Column): Column =
    stringSubstring(target, from, lit(1))
  def stringSlice(target: Column, from: Column, len: Column): Column =
    stringSubstring(target, from, len)

  /** 1 + number of capturing groups opened before the named group — the
    * group INDEX Java/Spark regexes address it by. -1 when absent. */
  private[graft] def namedGroupIndex(pattern: String, name: String): Int = {
    var idx = 0
    var i = 0
    while (i < pattern.length - 1) {
      if (pattern.charAt(i) == '\\') i += 1 // skip escaped char
      else if (pattern.charAt(i) == '(') {
        if (pattern.startsWith(s"(?<$name>", i)) return idx + 1
        // (?...) opens a non-capturing / lookaround group UNLESS it is a
        // named group (?<name>...)
        if (i + 1 >= pattern.length || pattern.charAt(i + 1) != '?' ||
            (i + 2 < pattern.length && pattern.charAt(i + 2) == '<' &&
              i + 3 < pattern.length && pattern.charAt(i + 3) != '=' &&
              pattern.charAt(i + 3) != '!'))
          idx += 1
      }
      i += 1
    }
    -1
  }

  private def countGroups(pattern: String): Int =
    java.util.regex.Pattern.compile(pattern).matcher("").groupCount()

  /** regexp string_slice by group index. Out-of-range groups take the
    * default (the reference's nth >= num_regs path) — resolved here at
    * plan time since the pattern is a literal. */
  def stringSliceRegexp(target: Column, pattern: String, group: Int,
      default: Column = lit("")): Column =
    if (group < 0 || group > countGroups(pattern)) default
    else when(target.rlike(pattern), regexp_extract(target, pattern, group))
      .otherwise(default)

  /** regexp string_slice by GROUP NAME (onig_name_to_backref_number —
    * here resolved to the group's index at plan time). */
  def stringSliceRegexp(target: Column, pattern: String, name: String,
      default: Column): Column = {
    val idx = namedGroupIndex(pattern, name)
    if (idx < 0) default else stringSliceRegexp(target, pattern, idx, default)
  }

  def stringTokenize(target: Column, analyzer: String = "TokenBigram"): Column =
    GraftColumnBridge.column(
      StringTokenizeExpression(GraftColumnBridge.expression(target), analyzer))
}

/** array<string> of a named analyzer's tokens, in stream order — the
  * scalar (vector-returning) sibling of the TokenizeExpression generator;
  * `string_tokenize`'s GRN_TOKEN_GET cursor over the lexicon's analyzer
  * (/root/reference/plugins/functions/string.c:436-543). */
case class StringTokenizeExpression(child: Expression, analyzerName: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val tokenizer: Tokenizer = Analyzers.byName(analyzerName)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = tokenizer.tokenize(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(toks.map(t => UTF8String.fromString(t.term)))
  }

  override protected def withNewChildInternal(newChild: Expression): StringTokenizeExpression =
    copy(child = newChild)
}
