package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * This is the hot inner loop of every similarity/ANN operator: the
  * higher-order-function formulation (`aggregate(zip_with(...))`) never
  * enters whole-stage codegen (Spark evaluates HOFs interpreted, with a
  * lambda closure per element), which round-1 measurement showed to be
  * the dominant cost of the ANN queries. `doGenCode` emits a tight
  * primitive `for` loop over the two ArrayData buffers — no boxing, no
  * closures, stays inside whole-stage codegen.
  *
  * Mismatched lengths take the common prefix (same convention as the
  * HOF zip_with it replaces — corpus/query dims always match in
  * practice).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got $l and $r")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  // A null ELEMENT poisons the whole dot product to null — same
  // semantics as the aggregate(zip_with(...)) formulation this
  // replaces; treating the slot as 0.0 would fabricate a finite, wrong
  // similarity score. isNullAt on UnsafeArrayData is a bit test — the
  // branch is free next to the multiply.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  // Locals go through ctx.freshName: two vec_dot calls can land in the
  // same generated function (e.g. one projection computing scores
  // against two query vectors), where fixed names collide and knock the
  // whole stage back to interpreted execution.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val anyNull = ctx.freshName("anyNull")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |if ($anyNull) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
