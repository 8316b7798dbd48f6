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
  * Length-mismatched inputs return NULL — the loud malformed-data signal the
  * zip_with composition also gave (its null padding nulled the fold); a
  * silent min-length truncation would mask corrupt embeddings inside
  * similarity ranks (review finding). Null elements are treated as 0
  * contribution (embeddings are dense; defensive rather than semantic).
  * Registered as `graft_dot` via [[graft.GraftExtensions]].
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

  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
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
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $acc += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** 48-bit SimHash from an array of 48-bit token hashes: bit b of the result
  * is set iff strictly more tokens have bit b set than cleared (the Charikar
  * majority vote; reference semantics in graft.ops.DedupQueries).
  *
  * Replaces a doubly-nested higher-order `aggregate` (48 × n_tokens
  * interpreted lambda evaluations per row, CodegenFallback) with one
  * generated two-level primitive loop — same integer logic, so the DuckDB
  * oracle (list_sum over generate_series) matches bit-for-bit.
  *
  * Null token hashes are skipped (counted neither direction), matching the
  * dense non-null inputs both engines actually see. Registered as
  * `graft_simhash` via [[graft.GraftExtensions]]. */
case class SimHash48(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](48)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 48) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 48) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[48];
         |for (int $i = 0; $i < $hs.numElements(); $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    long $h = $hs.getLong($i);
         |    for (int $b = 0; $b < 48; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 48; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

/** Minimal-band emission test for banded-LSH pair generation: true iff NO
  * band strictly before `bandIdx` is a live collision for this pair — i.e.
  * `bandIdx` is the FIRST band where the two signatures agree on an
  * un-dropped bucket, so a band self-join filtered on this predicate emits
  * every colliding pair EXACTLY once and the pair-volume `distinct()` (a
  * full exchange + dedup aggregate of the candidate stream — the only
  * pair-sized shuffle left in the round-12 arrays-off-the-pair-shuffle
  * plan) can be dropped outright.
  *
  * Arguments: the joined row's band index, and both vectors' FULL per-band
  * signature arrays, where a band whose bucket the
  * [[graft.ops.DedupQueries.SimhashBucketCap]] guard dropped holds NULL
  * instead of its band value. Droppedness is a property of the BUCKET
  * (band_idx, band_val): two vectors colliding in band j share that bucket,
  * so they null out band j together and `sig_a[j] <=> sig_b[j]`'s collision
  * verdict is symmetric by construction — a null on either side reads as
  * "not a live collision", which is exactly the cap guard's semantics
  * (capped buckets emit no pairs). Exactly-once then follows: a pair's live
  * collision bands form a fixed set; precisely one of them is minimal.
  *
  * Why a custom `Expression`: the predicate runs INSIDE the candidate
  * self-join at pair volume (~10⁸ rows at the 100× probe scale). The
  * `exists(sequence(...), ...)` spelling is a higher-order function —
  * CodegenFallback, interpreted per element, and it would break the join
  * stage's WholeStageCodegen span exactly where row volume peaks (the same
  * reasoning as [[DotProduct]]). This generates a tight primitive loop with
  * early exit inline in the join's generated Java.
  *
  * Null contract: any NULL argument → NULL (null-intolerant ternary); a
  * `bandIdx` outside [0, min(|sigA|, |sigB|)] → NULL, the loud
  * malformed-signature signal (same contract as [[DotProduct]]'s length
  * mismatch). Registered as `graft_min_band` via [[graft.GraftExtensions]]. */
case class MinBandEmit(bandIdx: Expression, sigA: Expression, sigB: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = bandIdx
  override def second: Expression = sigA
  override def third: Expression = sigB

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (bandIdx.dataType == org.apache.spark.sql.types.LongType &&
        arr(sigA.dataType) && arr(sigB.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, array<bigint>, array<bigint>), got " +
        s"${bandIdx.dataType.sql}, ${sigA.dataType.sql}, ${sigB.dataType.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_min_band"
  override def nullable: Boolean = true

  override protected def nullSafeEval(k: Any, a: Any, b: Any): Any = {
    val idx = k.asInstanceOf[Long]
    val sa = a.asInstanceOf[ArrayData]
    val sb = b.asInstanceOf[ArrayData]
    if (idx < 0 || idx > sa.numElements() || idx > sb.numElements()) return null
    var j = 0
    val n = idx.toInt
    while (j < n) {
      if (!sa.isNullAt(j) && !sb.isNullAt(j) && sa.getLong(j) == sb.getLong(j))
        return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, a, b) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val hit = ctx.freshName("hit")
      s"""
         |if ($k < 0 || $k > $a.numElements() || $k > $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = (int) $k;
         |  boolean $hit = false;
         |  for (int $j = 0; $j < $n && !$hit; $j++) {
         |    if (!$a.isNullAt($j) && !$b.isNullAt($j) &&
         |        $a.getLong($j) == $b.getLong($j)) {
         |      $hit = true;
         |    }
         |  }
         |  ${ev.value} = !$hit;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinBandEmit =
    copy(bandIdx = newFirst, sigA = newSecond, sigB = newThird)
}
