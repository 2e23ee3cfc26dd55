/** Native engine expressions. This file lives under
  * `org.apache.spark.sql.graftnative` (not `graft`) because the seams a
  * native Catalyst expression needs — `AbstractDataType` for input-type
  * coercion and `ExpressionUtils.column` to lift an Expression into the
  * public Column DSL — are `private[sql]`. Compiling inside an sql
  * subpackage is the established pattern for libraries that ship codegen
  * expressions. The public surface for users is `graft.functions`.
  */
package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Dot product of two ARRAY<DOUBLE> columns as a codegen'd expression.
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (acc,p) -> acc+p)` — allocates an intermediate array and evaluates
  * interpreted lambdas per element; this expression runs one fused
  * primitive loop inside whole-stage codegen. Preference ladder: built-in
  * > native Expression > UDF.
  *
  * Semantics: null input → null; null *elements* contribute 0; length
  * mismatch uses the shorter prefix. Summation is strictly sequential
  * left-to-right — bit-identical to the HOF fold it replaces, so the
  * DuckDB oracles (`list_dot_product`) keep matching.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Bridge for code outside the sql package. */
object GraftNative {
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** SQL-function builder shared by GraftExtensions and register(). */
  val dotBuilder: Seq[Expression] => Expression =
    children => DotProduct(children.head, children(1))

  /** Register `graft_dot` on an already-running session (extensions only
    * apply at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
}
