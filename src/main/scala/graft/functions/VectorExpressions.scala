package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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

/** ALL hyperplane-LSH sign buckets of one vector in a single native
  * expression: element `t` of the `array<long>` result packs the sign
  * bits of table `t`'s `bits` plane dot products (bit `b` set iff
  * `vec · planes(t)(b) >= 0`).
  *
  * Why one expression and not `tables × bits` [[DotProduct]] columns:
  * the unrolled formulation's generated code grows LINEARLY with the
  * sketch shape, and [[graft.ops.Similarity.planSignBits]] grows the
  * shape with the corpus — at the 10× rehearsal the planned
  * ~200-plane projection crossed janino's 64 KB method limit and the
  * whole stage silently fell back to interpreted execution (measured
  * this round: every `generate_doConsume` consuming the bucket
  * projection failed to compile). Here the planes ride along as ONE
  * flat `double[]` reference object and the generated code is a fixed
  * triple loop — constant code size for ANY (bits, tables, dim).
  *
  * Per-dot arithmetic is bit-identical to `vec_dot(vec, lit(plane))
  * >= 0`: strictly left-to-right summation over the common prefix of
  * (vector length, plane length). A null vector yields a null array
  * (upstream [[graft.ops.Similarity]] sides filter null/zero-norm
  * vectors anyway); a null ELEMENT poisons the affected dots to
  * "not >= 0" — bit clear — exactly like the `when(vec_dot >= 0, …)
  * .otherwise(0)` spelling it replaces.
  */
case class LshSignBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val tables = planes.length
  private val bits = if (tables == 0) 0 else planes(0).length
  private val dim = if (bits == 0) 0 else planes(0)(0).length
  require(tables >= 1 && bits >= 1 && bits <= 63 && dim >= 1,
    s"lsh_sign_buckets needs a (tables >= 1) x (1 <= bits <= 63) x (dim >= 1) " +
      s"plane tensor, got $tables x $bits x $dim")
  require(planes.forall(t => t.length == bits && t.forall(_.length == dim)),
    "lsh_sign_buckets plane tensor must be rectangular")

  /** Flattened (t, b, k) -> planes(t)(b)(k) — one contiguous reference
    * object for codegen instead of a nested array walk per dot.
    */
  private lazy val flat: Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        System.arraycopy(planes(t)(b), 0, out, (t * bits + b) * dim, dim)
        b += 1
      }
      t += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_buckets requires an array<double> argument, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "lsh_sign_buckets"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0
      var packed = 0L
      while (b < bits) {
        val off = (t * bits + b) * dim
        var s = 0.0
        var nul = false
        var k = 0
        while (k < n && !nul) {
          if (v.isNullAt(k)) nul = true
          else { s += v.getDouble(k) * flat(off + k); k += 1 }
        }
        if (!nul && s >= 0) packed |= 1L << b
        b += 1
      }
      out(t) = packed
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanesFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val nul = ctx.freshName("nul")
      val off = ctx.freshName("off")
      val packed = ctx.freshName("packed")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $packed = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    int $off = ($t * $bits + $b) * $dim;
         |    double $s = 0.0;
         |    boolean $nul = false;
         |    for (int $k = 0; $k < $n; $k++) {
         |      if ($v.isNullAt($k)) { $nul = true; break; }
         |      $s += $v.getDouble($k) * $flatRef[$off + $k];
         |    }
         |    if (!$nul && $s >= 0) $packed |= 1L << $b;
         |  }
         |  $out[$t] = $packed;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignBuckets =
    copy(child = newChild)
}
