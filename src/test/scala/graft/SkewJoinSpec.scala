package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

/** Salted join: exact result parity with the plain join on skewed data,
  * and the salt actually spreads the hot key. */
class SkewJoinSpec extends SparkSpec {

  test("salted inner join ≡ plain inner join on 90%-hot-key data") {
    // 10k rows, 90% on key 7 — the shape AQE only fixes after the fact
    val large = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id") % 100).as("k"),
        (col("id") * 3).as("payload"))
    val small = spark.range(100).select(col("id").as("k"), concat(lit("dim"), col("id")).as("name"))

    val plain = large.join(small, Seq("k"))
      .select("k", "id", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(large, small, Seq("k"), col("id"), 8)
      .select("k", "id", "payload", "name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sorted.toSeq
    salted shouldBe plain
  }

  test("the hot key's rows land on every salt value") {
    val large = spark.range(8000).select(col("id"), lit(7L).as("k"))
    val salts = large
      .withColumn("_salt", pmod(xxhash64(col("id")), lit(8)))
      .select("_salt").distinct().collect().map(_.getLong(0)).toSet
    salts shouldBe (0L until 8L).toSet // all 8 shuffle lanes used
  }
}
