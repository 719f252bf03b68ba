package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

object PolyHashUtil {
  /** polynomial rolling hash over unicode code points with per-step modulo —
    * engine-independent (reproducible in any SQL dialect via a left fold),
    * unlike builtin xxhash64/duckdb-hash. Used for dedup fingerprints,
    * minhash base hashes and simhash term hashes. */
  def hash(s: UTF8String, mult: Long, mod: Long): Long = {
    if (s == null) return 0L
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Codegen-friendly Catalyst expression: polyhash(str, mult, mod) -> long.
  * Stays inside whole-stage codegen (single static call, no UDF boxing). */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"polyhash needs string input, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    PolyHashUtil.hash(v.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHashUtil.hash($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object GraftFunctions {
  final val HashMod = 1000000007L

  /** doc/term fingerprint hash (base 131, mod 1e9+7) */
  def poly_hash(c: Column): Column =
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c), 131L, HashMod))

  /** shingle base hash for minhash (base 31, mod 1e9+7) */
  def shingle_hash(c: Column): Column =
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c), 31L, HashMod))

  /** strip HTML/XML tags (reference plugin function html_untag) */
  def html_untag(c: Column): Column =
    org.apache.spark.sql.functions.regexp_replace(c, "<[^>]*>", "")
}
