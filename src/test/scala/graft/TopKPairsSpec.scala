package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must be indistinguishable from the
  * row_number window spelling it replaced in the mutual-kNN plan — same
  * entries, same ranks, same tie-breaks — while planning as a HashAggregate
  * (no sort of the input stream). */
class TopKPairsSpec extends SparkSpec {

  private val k = 5

  private def topk(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("src"))
    .agg(call_function("graft_topk_pairs", col("dst"), col("sv"), lit(k)).as("nbrs"))
    .select(col("src"), posexplode(col("nbrs")))
    .select(col("src"), col("col.id").as("dst"), col("col.sv").as("sv"),
      (col("pos") + 1).cast("long").as("rn"))

  private def windowed(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("src")).orderBy(col("sv").desc, col("dst"))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("src", "dst", "sv", "rn")
  }

  test("graft_topk_pairs ≡ row_number window (ties, ranks, cross-partition merge)") {
    // 97 groups × ~52 entries, sort values quantized to force real ties
    // (broken by dst ASC on both sides), spread over 16 partitions so the
    // partial/merge path — the SortArray merge — actually runs.
    val df = spark.range(5000).selectExpr(
      "pmod(id, 97) AS src", "id AS dst",
      "cast(pmod(id * 31, 40) as double) / 40.0 AS sv").repartition(16)
    val got = topk(df).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val ref = windowed(df).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    got.sortBy(t => (t._1, t._4)).toSeq shouldBe ref.sortBy(t => (t._1, t._4)).toSeq
  }

  test("groups shorter than k emit exactly their size, ranks dense from 1") {
    val df = spark.range(6).selectExpr(
      "pmod(id, 3) AS src", "id AS dst", "cast(id as double) AS sv")
    val got = topk(df).collect()
    got.length shouldBe 6
    got.groupBy(_.getLong(0)).values.foreach { g =>
      g.map(_.getLong(3)).sorted.toSeq shouldBe (1L to g.length.toLong)
    }
    // negative sort values stay above the sentinel floor
    val neg = spark.range(4).selectExpr(
      "0L AS src", "id AS dst", "cast(-1.0 - id as double) AS sv")
    topk(neg).count() shouldBe 4
  }

  test("plans as a hash aggregate — the input stream is never sorted") {
    val df = spark.range(1000).selectExpr(
      "pmod(id, 7) AS src", "id AS dst", "cast(id as double) AS sv")
    val p = plan(topk(df))
    p should include("HashAggregate")
    (p should not).include("WindowGroupLimit")
    (p should not).include("Window")
  }

  test("k must be a literal int within the slot budget, loudly") {
    val df = spark.range(10).selectExpr("0L AS src", "id AS dst", "cast(id as double) AS sv")
    an[AnalysisException] should be thrownBy
      df.groupBy(col("src"))
        .agg(call_function("graft_topk_pairs", col("dst"), col("sv"), lit(0)))
        .collect()
    an[AnalysisException] should be thrownBy
      df.groupBy(col("src"))
        .agg(call_function("graft_topk_pairs", col("dst"), col("sv"), lit(1000)))
        .collect()
    an[AnalysisException] should be thrownBy
      df.groupBy(col("src"))
        .agg(call_function("graft_topk_pairs", col("dst"), col("sv"), col("dst").cast("int")))
        .collect()
  }
}
