package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit md5 slice of a string: returns `array(h_lo, h_hi)` where
  * h_lo / h_hi are the unsigned 32-bit values of the digest's first and
  * second 4 bytes — EXACTLY `conv(substring(md5(s), 1, 8), 16, 10)` and
  * `conv(substring(md5(s), 9, 8), 16, 10)`, so every DuckDB oracle built
  * on the hex recipe still matches bit-for-bit.
  *
  * Why a custom Expression (same justification as FloatDotProduct): the
  * built-in path formats the 16-byte digest into a 32-char hex string,
  * substrings it twice, and parses each half back through base conversion —
  * four string allocations per token occurrence on the dedup hot path
  * (SimHash / MinHash hash the entire tokenized corpus). This computes the
  * two halves directly from the digest bytes: one md5, zero string work.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_hash64 expects a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash64.halves(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Hash64.halves($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash64 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First and second 4 digest bytes as unsigned 32-bit longs. */
  def halves(bytes: Array[Byte]): ArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    def u32(off: Int): Long =
      ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
    new GenericArrayData(Array(u32(0), u32(4)))
  }

  /** Column API: array(h_lo, h_hi) of the md5 of a string column. */
  def hash64(c: Column): Column = ColumnBridge.column(Md5Hash64(ColumnBridge.expression(c)))
}
