package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable alternative (`zip_with` + `aggregate` higher-order
  * functions) allocates a lambda frame per element and cannot be fused by
  * whole-stage codegen; on an all-pairs similarity join that interpretive
  * overhead dominates end-to-end runtime. These expressions generate a
  * tight primitive loop instead (and keep the same strict left-to-right
  * summation order, so results remain bit-identical to the fold-based
  * formulation and to external oracles using a sequential reduce).
  *
  * Inputs must already be `array<double>` — cast upstream (float->double
  * widening is exact).
  */
case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("xs")
      val y = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        double[] $x = $a.toDoubleArray();
        double[] $y = $b.toDoubleArray();
        int $n = Math.min($x.length, $y.length);
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) { $s += $x[$i] * $y[$i]; }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm with the same sequential summation order as the fold form. */
case class L2NormD(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm_d"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("xs")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
        double[] $x = $a.toDoubleArray();
        double $s = 0.0;
        for (int $i = 0; $i < $x.length; $i++) { $s += $x[$i] * $x[$i]; }
        ${ev.value} = java.lang.Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column wrappers (classic-mode Column <-> Expression bridge). */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProductD(expression(a), expression(b)))
  def l2Norm(a: Column): Column = column(L2NormD(expression(a)))
}
