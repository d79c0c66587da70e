package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path: float-array
  * dot product in double precision.
  *
  * The composed form (`aggregate(zip_with(a, b, (x, y) => x*y), …)`)
  * is correct but interpreted — higher-order functions don't codegen,
  * and each evaluation allocates an intermediate product array. This
  * expression emits a tight fused loop via doGenCode (inside the
  * whole-stage-codegen span), reading both arrays' primitive storage
  * directly: no allocation, no boxing. Accumulation order is index
  * 0..n-1 with floats widened to double — bit-identical to the
  * composed form, INCLUDING null semantics: unequal lengths yield NULL
  * (zip_with pads with null, null products nullify the sum) and a null
  * element on either side yields NULL (null propagates through the
  * aggregate's `+`).
  *
  * Registered through the PUBLIC extension point
  * ([[graft.GraftExtensions]] → `SparkSessionExtensions.injectFunction`)
  * and invoked via `call_function`, so no `private[sql]` API is used.
  */
case class DotProductFloat(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null even on non-null inputs (length mismatch / null elements)
  override def nullable: Boolean = true
  override def prettyName: String = DotProductFloat.name

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${DotProductFloat.name} expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  val name = "dot_product_float"

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[DotProductFloat].getName, name),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, s"$name takes 2 arguments, got ${exprs.length}")
      DotProductFloat(exprs.head, exprs(1))
    })
}

object VectorExpressions {
  /** Column wrapper: dot(a, b) in double, fused-loop codegen. Requires
    * [[graft.GraftExtensions]] on the session (all engine entry points
    * install it). */
  def dotF(a: Column, b: Column): Column =
    call_function(DotProductFloat.name, a, b)
}
