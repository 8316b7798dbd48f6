package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Ordered-pair expansion of an array — `graft_pairs(xs)` returns
  * `array<struct<a, b>>` holding every element pair whose comparison key
  * satisfies `key(b) > key(a)`, in the exact order the higher-order spelling
  * it replaces produced:
  *
  * {{{ flatten(transform(xs, a -> transform(filter(xs, b -> KEY(b) > KEY(a)),
  *                                          b -> struct(a, b)))) }}}
  *
  * i.e. outer loop over array positions, inner loop over array positions,
  * emit `(xs[i], xs[j])` when `key(xs[j]) > key(xs[i])`. The key is the
  * element itself for `array<bigint>` and the FIRST struct field for
  * `array<struct<bigint, ...>>` — the two shapes the engine's bucket-pair
  * enumerations use (co-purchase baskets, MinHash band buckets, LSH band
  * sweep arms, curation near-dup candidates).
  *
  * Why a custom Expression: the nested `transform(filter(...))` spelling is
  * CodegenFallback all the way down — per PAIR it evaluates interpreted
  * lambda closures (a bound comparison, a struct constructor, per-`a` filter
  * array allocations, then a `flatten` re-copy), which a round-18 profile put
  * at ~315 M interpreted lambda evaluations at 100× in the co-purchase key
  * alone. This kernel gathers keys once (a primitive long array), counts
  * pairs with a primitive nested loop, and emits each pair as one
  * two-field row — compiled Java behind a constant reference, keeping the
  * surrounding projection inside WholeStageCodegen.
  *
  * Semantics mirrored exactly, including edges: null array → null (this is a
  * null-intolerant UnaryExpression; the HOF also yields null); a null
  * element, or a struct element with a null key, joins no pairs (its
  * comparisons are null and `filter` drops them — here it is marked dead);
  * duplicate keys pair under strict `>` exactly as the HOF (none for either
  * side on equal keys; each OCCURRENCE pairs independently when duplicates
  * exist). Emitted structs carry the FULL elements; callers project the
  * fields they need (`p.a`, `p.b.doc_id`, ...) after `explode`.
  *
  * Registered as `graft_pairs` via [[graft.GraftExtensions]]. */
case class PairsExpand(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(s: StructType, _) if s.nonEmpty && s.head.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> or array<struct<bigint, ...>>, got ${other.sql}")
  }

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull
  /** -1 = atomic long elements; otherwise the element struct's field count. */
  private lazy val structFields: Int = elemType match {
    case s: StructType => s.size
    case _ => -1
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elemType, elemNullable),
    StructField("b", elemType, elemNullable))), containsNull = false)
  override def prettyName: String = "graft_pairs"

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val keys = new Array[Long](n)
    val live = new Array[Boolean](n)
    val elems = new Array[AnyRef](n)
    val nf = structFields
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        if (nf < 0) {
          val v = arr.getLong(i)
          keys(i) = v; live(i) = true; elems(i) = java.lang.Long.valueOf(v)
        } else {
          val r = arr.getStruct(i, nf)
          if (!r.isNullAt(0)) { keys(i) = r.getLong(0); live(i) = true; elems(i) = r }
        }
      }
      i += 1
    }
    var cnt = 0
    i = 0
    while (i < n) {
      if (live(i)) {
        val ki = keys(i)
        var j = 0
        while (j < n) { if (live(j) && keys(j) > ki) cnt += 1; j += 1 }
      }
      i += 1
    }
    val out = new Array[Any](cnt)
    var k = 0
    i = 0
    while (i < n) {
      if (live(i)) {
        val ki = keys(i)
        val ei = elems(i)
        var j = 0
        while (j < n) {
          if (live(j) && keys(j) > ki) {
            out(k) = new GenericInternalRow(Array[Any](ei, elems(j)))
            k += 1
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Instance reference, not a static call: compute() needs the element
    // shape (atomic vs struct, field count) resolved at planning time.
    val ref = ctx.addReferenceObj("graftPairs", this, classOf[PairsExpand].getName)
    defineCodeGen(ctx, ev, xs => s"$ref.compute($xs)")
  }

  override protected def withNewChildInternal(newChild: Expression): PairsExpand =
    copy(child = newChild)
}
