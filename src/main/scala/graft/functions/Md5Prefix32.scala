package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit md5 prefix of a string, as an unsigned long — EXACTLY
  * `conv(substring(md5(s), 1, 8), 16, 10)` (the [[graft.ops.Portable]]
  * `hash32` recipe every DuckDB oracle replays), computed straight from
  * the digest bytes (r21).
  *
  * Why a custom Expression (the [[Md5Hash64]] justification, applied to
  * the single-word case): the built-in chain formats the 16-byte digest
  * into a 32-char hex string, substrings it, and parses the half back
  * through base conversion — three string allocations per evaluation on
  * paths that hash EVERY TOKEN of the corpus (the C87/C317 feature
  * hash, deterministic sampling, salting, the q_walks hash rule). This
  * is one md5 and four byte reads; [[Md5Hash64]] is the two-word
  * sibling for callers that need 64 bits.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix32 expects a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix32.prefix32(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix32.prefix32($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix32 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 digest bytes as an unsigned 32-bit long. */
  def prefix32(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Column API: the unsigned 32-bit md5 prefix of a string column. */
  def prefix32(c: Column): Column =
    ColumnBridge.column(Md5Prefix32(ColumnBridge.expression(c)))
}
