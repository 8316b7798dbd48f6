package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.Tables

/** Batch source/sink format coverage beyond parquet: CSV and JSON lines
  * round-trip with explicit schemas (the 100 TB rule: never schema-infer on
  * read — inference is a full extra pass over the data). */
class FormatsSpec extends SparkSpec {

  private val dir = java.nio.file.Files.createTempDirectory("graft_formats").toString

  test("csv round-trip preserves rows and aggregates") {
    val src = Tables(spark, sf).orders
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/orders_csv")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType)))
    val back = spark.read.option("header", "true").schema(schema).csv(s"$dir/orders_csv")
    back.count() shouldBe src.count()
    val a = src.agg(sum(expr("cast(o_totalprice as decimal(18,2))"))).collect()(0).getDecimal(0)
    val b = back.agg(sum(expr("cast(o_totalprice as decimal(18,2))"))).collect()(0).getDecimal(0)
    b shouldBe a // decimal-exact through the text round-trip
  }

  test("json-lines round-trip preserves nested structure") {
    val src = Tables(spark, sf).events
      .select(col("event_id"), col("user_id"),
        struct(col("event_type"), col("value")).as("payload"))
    src.write.mode("overwrite").json(s"$dir/events_json")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("payload", StructType(Seq(
        StructField("event_type", StringType), StructField("value", DoubleType))))))
    val back = spark.read.schema(schema).json(s"$dir/events_json")
    back.count() shouldBe src.count()
    back.select(col("payload.event_type")).distinct().count() shouldBe
      src.select(col("payload.event_type")).distinct().count()
    // spot-check a full row survives the nesting round-trip
    val k = src.orderBy("event_id").limit(1).collect()(0)
    val k2 = back.orderBy("event_id").limit(1).collect()(0)
    k2.getLong(0) shouldBe k.getLong(0)
    k2.getStruct(2).getString(0) shouldBe k.getStruct(2).getString(0)
  }
}
