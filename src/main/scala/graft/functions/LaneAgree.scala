package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Count of positionally-equal string lanes between two signature arrays —
  * `graft_lane_agree(sig_a, sig_b)` is the MinHash band-agreement kernel,
  * replacing the higher-order spelling
  * `size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))`.
  *
  * Semantics mirrored exactly: `zip_with` pads the shorter array with nulls
  * and `x = y` with a null operand is null, which `filter(v -> v)` drops —
  * so only positions present AND non-null in BOTH arrays can count, i.e. one
  * pass over the common prefix counting non-null equal lanes. Null array on
  * either side → null (the HOF chain also nulls through).
  *
  * Why a custom Expression: `zip_with`/`filter` are CodegenFallback, so the
  * old spelling ran interpreted per candidate PAIR (two lambda closures plus
  * a zipped struct array and a filtered copy, ~16 lanes each) in the hottest
  * dedup stage. This kernel is one compiled loop of UTF8String equality
  * checks and keeps the per-pair scoring projection inside
  * WholeStageCodegen.
  *
  * Registered as `graft_lane_agree` via [[graft.GraftExtensions]]. */
case class LaneAgree(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>), got (${l.sql}, ${r.sql})")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lane_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LaneAgree.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LaneAgree.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LaneAgree =
    copy(left = newLeft, right = newRight)
}

object LaneAgree {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getUTF8String(i).equals(b.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
