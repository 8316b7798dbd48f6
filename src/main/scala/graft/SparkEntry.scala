package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Every engine query, assembled from the per-module registries. */
  def all: Seq[QueryDef] =
    ops.EventRegistry.all ++ ops.RelationalRegistry.all ++ ops.TpchRegistry.all ++
      ops.TextRegistry.all ++
      ops.DedupRegistry.all ++ ops.VectorRegistry.all ++ ops.StatsRegistry.all ++
      ops.MultimodalRegistry.all ++ ops.CurationRegistry.all ++
      ops.PipelineRegistry.all ++ ops.ClusterRegistry.all ++
      ops.TimeseriesRegistry.all ++ ops.GraphRegistry.all ++
      ops.BehaviorRegistry.all ++
      ops.FormatQueries.all ++ tables.TableRegistry.all ++
      streaming.StreamRegistry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The K1→K6 chain of the reference: validity filter + 1-minute tumbling
    * MAX/MIN/AVG per key (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    ops.EventQueries.tumblingMinAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
