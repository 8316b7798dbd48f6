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

  /** `events.ts` has shipped as either parquet TIMESTAMP(MICROS) (current
    * testdata) or TIMESTAMP(NANOS) (earlier drops). Spark's vectorized reader
    * rejects nanos unless `spark.sql.legacy.parquet.nanosAsLong=true` (set
    * once in [[graft.GraftSession.tune]]) reads it as a long; that long is
    * truncated here to microsecond timestamps (the same truncation DuckDB
    * applies). Micros-native files pass through untouched, so the loader is
    * schema-driven rather than generation-pinned. */
  private def withNanoTs(name: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DateType, LongType, TimestampType, TimestampNTZType}
    val df = table(name)
    df.schema(tsCol).dataType match {
      case TimestampType => df
      case DateType =>
        // date32 generation: midnight-UTC timestamp (session tz is pinned
        // UTC, so this matches DuckDB's EPOCH(DATE) second count exactly).
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case TimestampNTZType =>
        // Parquet isAdjustedToUTC=false reads as NTZ; the session timezone is
        // pinned UTC (GraftSession), so this cast re-tags the same instant with
        // the TimestampType the whole engine (unix_micros, casts, windows,
        // watermarks) was built against.
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case LongType =>
        // nanosAsLong read of a TIMESTAMP(NANOS) file: truncate to micros.
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case other =>
        throw new IllegalStateException(
          s"$name.$tsCol: unexpected type $other — expected timestamp or " +
            "long (TIMESTAMP(NANOS) via spark.sql.legacy.parquet.nanosAsLong)")
    }
  }

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  // o_orderdate / l_shipdate ride the same physical-type insurance as
  // events.ts: testdata generations have switched timestamp physical types
  // between rounds before, and these two are the only other timestamp
  // columns the query inventory depends on.
  def orders: DataFrame = withNanoTs("orders", "o_orderdate")
  def lineitem: DataFrame = withNanoTs("lineitem", "l_shipdate")
  def events: DataFrame = withNanoTs("events", "ts")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
