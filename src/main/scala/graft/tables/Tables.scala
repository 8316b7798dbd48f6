package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's parquet source
  * handles column pruning and predicate pushdown — callers select/filter and
  * the scan narrows automatically (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`). At 100 TB these become partitioned/bucketed table reads; the
  * query builders never assume single-file inputs.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; `spark.sql.legacy.parquet.nanosAsLong=true` (set once in
    * [[graft.GraftSession.tune]]) reads it as a long, truncated here to
    * microsecond timestamps (the same truncation DuckDB applies). Requiring
    * the session conf — instead of setting it as a side effect per call —
    * keeps plan building pure (round-1 ADVICE). */
  private def withNanoTs(name: String, tsCol: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events requires spark.sql.legacy.parquet.nanosAsLong=true — build the " +
        "session via GraftSession (local/tune)")
    import org.apache.spark.sql.functions._
    table(name).withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
  }

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def events: DataFrame = withNanoTs("events", "ts")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
