package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{CdcChunkLens, CdcChunks, DotProduct, LaneAgree, MinBandEmit, MinHash16, PairsExpand, Shingles, SimHash48, TopKPairs, ZOrder2}

/** Engine extension point, installed via `spark.sql.extensions`
  * ([[GraftSession.tune]] wires it into every entry point): registers the
  * engine's native expressions so they are usable from both the DataFrame API
  * (`call_function("graft_dot", ...)`) and plain SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = { children =>
    // A clean analysis error instead of an IndexOutOfBounds from the builder.
    if (children.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${children.length}")
    b(children)
  }

  private def fn(name: String, clazz: Class[_], n: Int)(b: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), arity(name, n)(b))

  /** The engine's native expressions — one list shared by the extension
    * injection and the imperative fallback below. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_dot", classOf[DotProduct], 2)(c => DotProduct(c.head, c(1))),
    fn("graft_simhash", classOf[SimHash48], 1)(c => SimHash48(c.head)),
    fn("graft_minhash", classOf[MinHash16], 1)(c => MinHash16(c.head)),
    fn("graft_shingles", classOf[Shingles], 2)(c => Shingles(c.head, c(1))),
    fn("graft_min_band", classOf[MinBandEmit], 3)(c => MinBandEmit(c.head, c(1), c(2))),
    fn("graft_topk_pairs", classOf[TopKPairs], 3)(c => TopKPairs(c.head, c(1), c(2))),
    fn("graft_cdc_chunks", classOf[CdcChunks], 1)(c => CdcChunks(c.head)),
    fn("graft_cdc_chunk_lens", classOf[CdcChunkLens], 1)(c => CdcChunkLens(c.head)),
    fn("graft_zorder", classOf[ZOrder2], 2)(c => ZOrder2(c.head, c(1))),
    fn("graft_pairs", classOf[PairsExpand], 1)(c => PairsExpand(c.head)),
    fn("graft_lane_agree", classOf[LaneAgree], 2)(c => LaneAgree(c.head, c(1))),
    // Spark's own runtime-filter bloom pair (codegen'd, XXH64-keyed),
    // surfaced as engine functions so a query can build the filter over a
    // dim side and probe it at a fact scan EXPLICITLY — the semi-join
    // reduction the optimizer's InjectRuntimeFilter applies opportunistically,
    // made deterministic and composable. Args: (xxhash64 value, est items);
    // (serialized filter, xxhash64 value).
    fn("graft_bloom_agg", classOf[BloomFilterAggregate], 2)(c =>
      new BloomFilterAggregate(c.head, c(1))),
    fn("graft_bloom_contains", classOf[BloomFilterMightContain], 2)(c =>
      new BloomFilterMightContain(c.head, c(1))))

  /** `builder.getOrCreate()` silently IGNORES `spark.sql.extensions` when a
    * SparkSession already exists in the JVM (an embedding host may have built
    * one first) — the engine's functions would then fail to resolve at
    * analysis time, far from the cause. Register imperatively into the
    * session's own function registry when that happens; idempotent. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    registrations.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
