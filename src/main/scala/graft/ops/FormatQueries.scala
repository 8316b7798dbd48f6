package graft.ops


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Source-format round-trips under the driver's hash gate (the FormatsSpec
  * suite covers them spec-side; this puts the actual CSV/JSON source
  * machinery — writers, schema'd readers, header handling — on the same
  * oracle footing as every operator).
  *
  * Shape at scale: format choice changes the SCAN, not the plan above it —
  * the staged copies are read with explicit schemas (schema inference is a
  * full extra pass at 100 TB; never rely on it), then the join + aggregate
  * is the ordinary broadcast-dim rollup. CSV/JSON scans cannot prune
  * columns or push predicates the way parquet does, which is exactly why a
  * pipeline ingests text formats ONCE and persists parquet; this query is
  * the ingest step's correctness check. */
object FormatQueries {

  /** Stage customer as headered CSV and nation as JSON lines, read both
    * back, and roll up account balances per nation — byte-identical to the
    * same rollup over the original parquet (the oracle). */
  def formatRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val base = graft.TempDirs.scratch("graft_formats").toString
    t.customer.write.mode("overwrite").option("header", "true")
      .csv(s"$base/customer_csv")
    t.nation.write.mode("overwrite").json(s"$base/nation_json")
    val customer = spark.read.option("header", "true")
      .schema("c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
        "c_acctbal DOUBLE, c_mktsegment STRING")
      .csv(s"$base/customer_csv")
    val nation = spark.read
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .json(s"$base/nation_json")
    customer.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), Out.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("n_name"))
  }

  /** Stage orders as ORC, read back with an explicit schema, and roll up
    * high-value order counts per status — byte-identical to the same
    * rollup over the original parquet (the oracle). Unlike the CSV/JSON
    * leg, ORC is a columnar format whose scan DOES prune columns and push
    * the `o_totalprice` predicate (min/max stripe stats), so this is the
    * "switch the lake's file format" check: the plan above the scan is
    * unchanged and the scan keeps its pushdown contract. */
  def formatOrc(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val base = graft.TempDirs.scratch("graft_orc").toString
    val src = t.orders
    src.write.mode("overwrite").orc(s"$base/orders_orc")
    // The timestamp flavor (LTZ vs NTZ) depends on how the parquet source was
    // read (spark.sql.parquet.inferTimestampNTZ); ORC stores each as a
    // distinct type and refuses to cast between them on read — so the read
    // schema is DERIVED from what was just written, never hard-coded.
    val orders = spark.read.schema(src.schema).orc(s"$base/orders_orc")
    orders
      .filter(col("o_totalprice") > 100000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Out.dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  val all: Seq[graft.QueryDef] = Seq(
    graft.QueryDef("q_format_roundtrip",
      s"""SELECT n_name, count(*) AS n_cust,
         |  ${Out.sql.dsum("c_acctbal")} AS sum_bal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY n_name""".stripMargin)(formatRoundtrip),

    graft.QueryDef("q_format_orc",
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |  ${Out.sql.dsum("o_totalprice")} AS sum_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM orders WHERE o_totalprice > 100000.0
         |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)(formatOrc))
}
