package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two float arrays: one traversal
  * accumulating dot(a,b), dot(a,a), dot(b,b) simultaneously, then
  * dot/(√aa·√bb) — versus three separate array passes when composed from
  * dot products. Bit-identical to
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` because each of the
  * three sums accumulates left-to-right in double exactly as the separate
  * passes do, and the final arithmetic is the same expression tree.
  * Null on: null input, length mismatch, null element (matching
  * FloatDotProduct and the composed form).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got ${left.dataType} and ${right.dataType}")
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
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      ab += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val ab = ctx.freshName("ab")
    val aa = ctx.freshName("aa")
    val bb = ctx.freshName("bb")
    val xv = ctx.freshName("xv")
    val yv = ctx.freshName("yv")
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
         |      double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
         |          $anyNull = true; break;
         |        }
         |        final double $xv = (double) ${leftGen.value}.getFloat($i);
         |        final double $yv = (double) ${rightGen.value}.getFloat($i);
         |        $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |      }
         |      if (!$anyNull) {
         |        ${ev.isNull} = false;
         |        ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
         |      }
         |    }
         |  }
         |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry: fused cosine similarity of two array<float> columns. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
