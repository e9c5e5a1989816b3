package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two float arrays, accumulated in
  * double — the hot inner loop of similarity search (SURVEY.md C11).
  *
  * Why a custom Catalyst Expression (the one place built-ins genuinely
  * fall short): the composable form
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0d, (acc, v) -> acc + v)`
  * is a HigherOrderFunction — CodegenFallback, so every row pays
  * interpreted lambda dispatch and an intermediate product array. This
  * expression generates a tight fused loop inside WholeStageCodegen: no
  * allocation, no virtual calls.
  *
  * Semantics are IDENTICAL to the fold (same left-to-right double
  * accumulation order — bit-equal results, so the same DuckDB oracles
  * apply): null if either array is null, lengths differ, or any element
  * is null.
  */
case class FloatDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects two array<float> arguments, got ${left.dataType} and ${right.dataType}")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val anyNull = ctx.freshName("anyNull")
    val resultCode =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${leftGen.isNull}) {
         |  ${rightGen.code}
         |  if (!${rightGen.isNull}) {
         |    final int $n = ${leftGen.value}.numElements();
         |    if ($n == ${rightGen.value}.numElements()) {
         |      boolean $anyNull = false;
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
         |          $anyNull = true; break;
         |        }
         |        $acc += (double) ${leftGen.value}.getFloat($i) *
         |                (double) ${rightGen.value}.getFloat($i);
         |      }
         |      if (!$anyNull) { ${ev.isNull} = false; ${ev.value} = $acc; }
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  /** Column-API entry: native dot product of two array<float> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
