package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: the non-empty segments of a string split
  * on runs of Java-regex `\s` — BIT-IDENTICAL to the reference form
  * `filter(split(c, "\\s+"), t => t =!= "")` that every text operator
  * tokenizes with (and that every DuckDB oracle mirrors as
  * `list_filter(string_split_regex(text, '\s+'), x -> x <> '')`).
  *
  * Why a custom Expression (the FloatDotProduct justification): the
  * reference form runs a regex engine over the text AND an interpreted
  * higher-order `ArrayFilter` lambda per token — on the tokenize hot path
  * under ~40 text queries. This is one branchy byte scan, zero regex,
  * zero per-element lambda dispatch, inside whole-stage codegen.
  *
  * Correctness notes: Java's default `\s` is exactly
  * [ \t\n\x0B\f\r] — six ASCII bytes, so a UTF-8 BYTE scan is safe
  * (multi-byte code points never contain bytes < 0x80, and non-ASCII
  * whitespace like NBSP is NOT matched by `\s` — the scan must not match
  * it either, and does not). Spark's `split` keeps leading/trailing empty
  * segments (limit −1) which the filter then drops, so "all non-empty
  * maximal non-whitespace runs" is the exact reference semantics.
  * Equivalence is property-tested against the reference expression and
  * re-proven corpus-wide by every oracle hash-match.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ws_tokens expects a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WhitespaceTokens.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WhitespaceTokens.split($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WhitespaceTokens {

  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0b.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** All maximal non-whitespace byte runs as UTF8Strings. */
  def split(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  /** Column API: the tokens array of a string column. */
  def tokens(c: Column): Column = ColumnBridge.column(WhitespaceTokens(ColumnBridge.expression(c)))
}
