package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector dot product — the engine's one
  * hot scalar kernel (every similarity query evaluates it per row or per
  * candidate pair).
  *
  * Why a custom `Expression` and not `zip_with` + `aggregate`: higher-order
  * functions are `CodegenFallback` in Spark — each lambda step is an
  * interpreted expression-tree walk with per-element closure invocation, and
  * it breaks the surrounding WholeStageCodegen span. This expression instead
  * generates a tight primitive `double` loop inline in the stage's Java
  * (`doGenCode`), keeping the whole projection codegen'd — the (b) tier of
  * the build brief's preference order (composition → custom Expression →
  * custom operator), reached only because the composition tier measurably
  * dominated the vector queries' runtime.
  *
  * Determinism contract: sequential left-fold `acc += a(i)·b(i)` — the exact
  * operation order of the `aggregate(zip_with(a, b, *), 0.0, +)` composition
  * it replaces and of DuckDB's `list_sum(list_transform(...))` oracle
  * spelling, so results are bit-identical to both.
  *
  * Null elements are treated as 0 contribution (embeddings are dense;
  * defensive rather than semantic). Registered as `graft_dot` via
  * [[graft.GraftExtensions]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
