package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array — the entry stage of every
  * text-dedup query (jaccard, MinHash-LSH, curation), replacing the
  * higher-order composition
  * `array_distinct(transform(sequence(1, size(w)-n+1), i -> concat_ws(' ', slice(w, i, n))))`.
  *
  * Why a custom Expression: `transform` is CodegenFallback, so the lambda body
  * runs interpreted per shingle index and each step allocates a slice array, a
  * GenericArrayData and a concat buffer; `array_distinct` then makes a second
  * full pass. This kernel makes ONE pass over the token array, reuses a single
  * insertion-ordered set for dedup (identical first-occurrence order to
  * `array_distinct`), and keeps the surrounding projection inside
  * WholeStageCodegen. Verified element-identical to the composition in
  * PropertySpec.
  *
  * Semantics mirrored exactly: fewer than n tokens → empty array; null tokens
  * are skipped within a window (`concat_ws` semantics). One deliberate edge
  * divergence, safe for every caller: a NULL token *array* yields NULL (this
  * is a null-intolerant UnaryExpression) where the old spelling's
  * `case when size(w) >= n` guard yielded an empty array — both produce zero
  * rows under the `explode`/`size(sh) > 0` consumers.
  *
  * Registered as `graft_shingles(words, n)` via [[graft.GraftExtensions]];
  * `n` must be a foldable positive INT. */
case class Shingles(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      // n is foldable, so positivity is checkable at analysis time (round-3
      // review: n <= 0 would silently yield arrays of empty-string shingles).
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: n must not be null")
        case n: Integer if n <= 0 =>
          TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be positive, got $n")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(words: Any, n: Any): Any =
    Shingles.compute(words.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, n) => s"graft.functions.Shingles.compute($w, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Shingles =
    copy(left = newLeft, right = newRight)
}

object Shingles {

  private val space = UTF8String.fromString(" ")

  /** One pass: window i yields the space-join of the non-null tokens in
    * positions [i, i+n); distinct in first-occurrence order. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val total = words.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    val seen = new LinkedHashSet[UTF8String](Math.min(total, 1024))
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= total - n) {
      var k = 0
      var m = 0
      while (k < n) {
        if (!words.isNullAt(i + k)) {
          parts(m) = words.getUTF8String(i + k)
          m += 1
        }
        k += 1
      }
      seen.add(UTF8String.concatWs(space, java.util.Arrays.copyOf(parts, m): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
}
