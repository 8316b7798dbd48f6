package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Output-determinism helpers shared by every oracle-checked query.
  *
  * The driver hash-compares our parquet output against DuckDB's result, so
  * every emitted column must be bit-identical across both engines:
  *
  *   - timestamps → epoch seconds as BIGINT (`floor`, matching DuckDB
  *     `CAST(FLOOR(EPOCH(ts)) AS BIGINT)`); avoids parquet physical-type and
  *     timezone representation drift entirely;
  *   - SUM over doubles → sum a DECIMAL cast (exact, order-independent —
  *     a parallel double sum is not reproducible across partitionings), then
  *     cast the result to DOUBLE;
  *   - AVG over doubles → exact decimal SUM divided by COUNT, in double;
  *   - integer keys → BIGINT everywhere (int32 vs int64 physical types would
  *     otherwise depend on the engine);
  *   - ORDER BY keys must be NON-NULLABLE (source-non-null columns, or
  *     derived with an explicit coalesce): Spark's ASC default is NULLS
  *     FIRST while DuckDB's is NULLS LAST, so a nullable sort key reorders
  *     rows between the engines the moment realistic data carries a NULL —
  *     invisible on the NULL-free gate corpus, fatal on real data;
  *   - case mapping (UPPER/LOWER) agrees only on ASCII: Spark uses the
  *     JVM's full, locale-sensitive mapping where DuckDB uses utf8proc's
  *     1:1 codepoint mapping — non-ASCII text must be normalized upstream
  *     before a case-folded column may appear in an oracle-compared output.
  *
  * These are not test-only hacks: order-independent aggregation is exactly
  * what a 1000-executor run needs for reproducible results.
  */
object Out {
  /** Decimal type used for exact money/measure sums; wide enough for 100 TB
    * row counts (38-4 = 34 integer digits). */
  val SumDecimal: DecimalType = DecimalType(38, 4)

  /** Timestamp column → epoch seconds as BIGINT (floor). The leading
    * timestamp cast folds TIMESTAMP_NTZ (how Spark reads parquet timestamps
    * without a UTC flag) into session-UTC timestamps, which is exactly how
    * DuckDB's EPOCH treats naive timestamps. */
  def epochSec(c: Column): Column =
    floor(c.cast("timestamp").cast("double")).cast("long")

  /** Exact, partition-order-independent sum of a double measure, as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(SumDecimal)).cast("double")

  /** Deterministic average: exact decimal sum / count, evaluated in double. */
  def davg(c: Column): Column =
    sum(c.cast(SumDecimal)).cast("double") / count(c)

  /** DuckDB-side equivalents (string builders for oracle SQL). */
  object sql {
    def epochSec(expr: String): String =
      s"CAST(FLOOR(EPOCH($expr)) AS BIGINT)"
    def dsum(expr: String): String =
      s"CAST(SUM(CAST(($expr) AS DECIMAL(38,4))) AS DOUBLE)"
    def davg(expr: String): String =
      s"CAST(SUM(CAST(($expr) AS DECIMAL(38,4))) AS DOUBLE) / COUNT($expr)"
  }
}
