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
    * rejects; read it as a long (legacy conf) and truncate to microsecond
    * timestamps (the same truncation DuckDB applies when reading nanos). */
  private def withNanoTs(name: String, tsCol: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
