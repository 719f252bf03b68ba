package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.analyzer.{Analyzers, Tokenizer}

/** Catalyst Generator: graft_tokenize(text[, 'TokenBigram']) explodes a
  * string into (pos, term, status) rows — the `tokenize` command
  * (/root/reference/lib/proc/proc_tokenize.c:541-560) as a native
  * table-generating expression usable from SQL:
  *
  *   SELECT doc_id, t.pos, t.term
  *   FROM documents LATERAL VIEW graft_tokenize(text) t AS pos, term, status
  */
case class TokenizeExpression(child: Expression, tokenizerName: String)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  @transient private lazy val tokenizer: Tokenizer = Analyzers.byName(tokenizerName)

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("term", StringType, nullable = false),
    StructField("status", IntegerType, nullable = false)))

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else tokenizer.tokenize(v.asInstanceOf[UTF8String].toString).iterator.map { t =>
      InternalRow(t.pos, UTF8String.fromString(t.term), t.status)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeExpression =
    copy(child = newChild)
}

object TokenizeExpression {
  def tokenize(c: Column, tokenizer: String = "TokenBigram"): Column =
    GraftColumnBridge.column(
      TokenizeExpression(GraftColumnBridge.expression(c), tokenizer))
}
