package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate over (sort_value, id) pairs, ordered by
  * (sort_value DESC, id ASC) — `graft_topk_pairs(id, sort_value, k)` returns
  * `array<struct<id bigint, sv double>>` of the group's k best entries in
  * rank order (array position + 1 = the row_number the window spelling
  * assigns).
  *
  * == Measured limits (round 14) — prefer the window for k ≳ 3 ==
  *
  * This aggregate was built to replace mutual-kNN's
  * `row_number().over(partitionBy(src).orderBy(cos desc, dst))` on the
  * theory that a bounded hash-agg buffer beats WindowGroupLimit's sort-based
  * map-side prune. The theory LOST the measurement, instructively:
  *
  *  - The codegen'd update cascade is O(k²) CASE/WHEN terms; at k = 5 the
  *    generated update method crosses the JVM JIT's silent
  *    `DontCompileHugeMethods` bytecode limit (8 KB — far below Spark's own
  *    65 KB `hugeMethodLimit` warning threshold) and the hot loop runs
  *    INTERPRETED: a 200 M-row synthetic read 107.9 s at k = 5 vs 2.2 s at
  *    k = 1; re-running with `-XX:-DontCompileHugeMethods` dropped k = 5 to
  *    14.6 s, confirming the mechanism. A library cannot ship a JVM flag.
  *  - Even JIT-compiled, the cascade lost ~3× to the window on the same
  *    stream: WindowGroupLimit's prune is a radix-friendly sort of compact
  *    binary rows — Spark's optimized native top-k.
  *  - Measurement trap for the next person: a bare `.count()` above this
  *    aggregate PRUNES the unused aggregate expression and silently times
  *    `distinct(group key)` instead — consume the array (e.g.
  *    `sum(size(...))`) when benchmarking.
  *
  * q_mutual_knn therefore kept the window spelling
  * ([[graft.ops.VectorQueries.knnFrame]]); this function stays registered,
  * spec-pinned ([[graft.TopKPairsSpec]]) and correct for SMALL k (k ≤ 2
  * measured at parity or better), as the measured record of why the window
  * is the right plan.
  *
  * Why a DeclarativeAggregate with 2k PRIMITIVE buffer slots (cos₀..cosₖ₋₁,
  * id₀..idₖ₋₁, insertion-sorted, empty = sentinel) instead of a
  * TypedImperativeAggregate holding a heap: a TIA runs in
  * ObjectHashAggregateExec, which falls back to SORT-based aggregation past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default 128
  * distinct groups per task — always exceeded here), re-buying the very
  * sort this exists to delete, and fixing that would take a global conf
  * with memory implications for every other object aggregate. A fixed-width
  * all-primitive buffer runs in HashAggregateExec's vectorized hash map
  * with the update cascade inside WholeStageCodegen — the fastest aggregate
  * path Spark has. The price is k bounded at planning time
  * ([[TopKPairs.MaxK]]) and O(k) CASE/WHEN chains per slot; at the k = 5
  * mutual-kNN regime that is 10 buffer columns and a ~5-term cascade.
  *
  * Update semantics (one insertion step, branch-free in row count): `pos` =
  * how many existing entries beat the incoming (sv, id) under
  * (sv DESC, id ASC); slot i keeps itself below pos, takes the new entry at
  * pos, inherits slot i−1 above pos (the tail entry falls off). Sentinel
  * slots (sv = [[TopKPairs.SentinelSv]], below any real cosine/score) never
  * beat a real entry, so they fill from the front correctly. Merge applies
  * the same insertion step k times, feeding the right buffer's slots
  * through the left buffer — O(k²) expression terms, fully codegen'd,
  * evaluated only at combiner volume (≤ k rows per group per map task).
  *
  * Determinism: (sv DESC, id ASC) is a total order whenever ids are unique
  * within a group (true of the mutual-kNN directed pair stream, where
  * exactly-once emission guarantees one row per (src, dst)); a duplicated
  * (sv, id) would be kept twice, same as the window spelling would
  * double-rank it. NULL sv or id rows are skipped, matching row_number
  * filtered post-rank on non-null sort keys. */
case class TopKPairs(id: Expression, sv: Expression, kExpr: Expression)
    extends DeclarativeAggregate {

  import TopKPairs._

  override def children: Seq[Expression] = Seq(id, sv, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("sv", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (id.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint id, got ${id.dataType.sql}")
    if (sv.dataType != DoubleType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double sort value, got ${sv.dataType.sql}")
    if (!kExpr.foldable || kExpr.dataType != IntegerType)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int k, got ${kExpr.sql}")
    val kv = kExpr.eval()
    if (kv == null || kv.asInstanceOf[Int] < 1 || kv.asInstanceOf[Int] > MaxK)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= k <= $MaxK (buffer slots are planned " +
          s"columns), got $kv")
    TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  private lazy val svSlots: Seq[AttributeReference] =
    (0 until k).map(i => AttributeReference(s"tk_sv$i", DoubleType, nullable = false)())
  private lazy val idSlots: Seq[AttributeReference] =
    (0 until k).map(i => AttributeReference(s"tk_id$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = svSlots ++ idSlots

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(SentinelSv)) ++ Seq.fill(k)(Literal(SentinelId))

  /** One insertion of (newSv, newId) into sorted slot lists: returns the k
    * post-insert (sv, id) slot expressions. */
  private def insert(curSv: Seq[Expression], curId: Seq[Expression],
      newSv: Expression, newId: Expression): (Seq[Expression], Seq[Expression]) = {
    // existing entry i beats the incoming one under (sv DESC, id ASC)
    def beats(i: Int): Expression =
      Or(GreaterThan(curSv(i), newSv),
        And(EqualTo(curSv(i), newSv), LessThan(curId(i), newId)))
    val pos: Expression = (0 until k)
      .map(i => If(beats(i), Literal(1), Literal(0)))
      .reduce[Expression]((a, b) => Add(a, b))
    val outSv = (0 until k).map { i =>
      val shifted = if (i == 0) newSv else curSv(i - 1)
      CaseWhen(Seq(
        (GreaterThan(pos, Literal(i)), curSv(i)),
        (EqualTo(pos, Literal(i)), newSv)), shifted)
    }
    val outId = (0 until k).map { i =>
      val shifted = if (i == 0) newId else curId(i - 1)
      CaseWhen(Seq(
        (GreaterThan(pos, Literal(i)), curId(i)),
        (EqualTo(pos, Literal(i)), newId)), shifted)
    }
    (outSv, outId)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val (insSv, insId) = insert(svSlots, idSlots, sv, id)
    // a NULL sort value or id contributes nothing (row_number parity)
    val skip = Or(IsNull(sv), IsNull(id))
    insSv.zip(svSlots).map { case (e, old) => If(skip, old, e) } ++
      insId.zip(idSlots).map { case (e, old) => If(skip, old, e) }
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // NOT an insertion fold: folding the right buffer's k slots through
    // insert() k times rebuilds every intermediate level inside the next
    // level's expressions — an EXPONENTIAL expression tree (~(k²)^k nodes;
    // at k = 5 that is ~10⁷ and planning itself OOMs). Merge instead sorts
    // the 2k slots as one array of (−sv, id) structs — ascending struct
    // order ≡ (sv DESC, id ASC), sentinels (−sv = +10⁹) sort last — and
    // takes the first k. O(k²) tree; SortArray is evaluated at COMBINER
    // volume only (≤ one row per group per map task), never on the input
    // stream, so its lack of whole-stage codegen is irrelevant here.
    def entry(svE: Expression, idE: Expression): Expression =
      CreateNamedStruct(Seq(
        Literal("nsv"), UnaryMinus(svE), Literal("id"), idE))
    val merged = new SortArray(Concat(Seq(
      CreateArray((0 until k).map(i => entry(svSlots(i).left, idSlots(i).left))),
      CreateArray((0 until k).map(i => entry(svSlots(i).right, idSlots(i).right))))))
    val outSv = (0 until k).map { i =>
      UnaryMinus(GetStructField(ElementAt(merged, Literal(i + 1)), 0, Some("nsv")))
    }
    val outId = (0 until k).map { i =>
      GetStructField(ElementAt(merged, Literal(i + 1)), 1, Some("id"))
    }
    outSv ++ outId
  }

  override lazy val evaluateExpression: Expression = {
    // real entries are a sorted prefix (sentinels sort last by construction)
    val nReal: Expression = (0 until k)
      .map(i => If(GreaterThan(svSlots(i), Literal(SentinelSv)), Literal(1), Literal(0)))
      .reduce[Expression]((a, b) => Add(a, b))
    val entries = (0 until k).map { i =>
      CreateNamedStruct(Seq(Literal("id"), idSlots(i), Literal("sv"), svSlots(i)))
    }
    Slice(CreateArray(entries), Literal(1), nReal)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(id = newChildren(0), sv = newChildren(1), kExpr = newChildren(2))
}

object TopKPairs {
  /** Buffer slots are planned columns: 2k primitives per group. 32 bounds
    * the widest buffer at 512 B — past that a top-k stops being a "small
    * bounded buffer" aggregate and a window + WindowGroupLimit is the
    * honest plan. */
  val MaxK = 32

  /** Sorts below any real sort value this engine aggregates (cosines are
    * ≥ −1; BM25/quality scores are finite). An entry AT the sentinel is
    * indistinguishable from empty — acceptable for similarity scores, which
    * never reach −10⁹. */
  val SentinelSv: Double = -1e9
  val SentinelId: Long = -1L
}
