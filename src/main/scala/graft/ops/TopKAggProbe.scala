package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, GraftSession}

/** Synthetic A/B of the two per-group top-k spellings on an in-memory
  * generated stream (no parquet, no LSH) — isolates the per-row cost of the
  * graft_topk_pairs HashAggregate vs the row_number window +
  * WindowGroupLimit prune that q_mutual_knn chooses between.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.ops.TopKAggProbe [rows] [groups] [k]"`. */
object TopKAggProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(200000000L)
    val groups = args.lift(1).map(_.toLong).getOrElse(200000L)
    val k = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(GraftSession.withMaster(
      SparkSession.builder().config("spark.sql.shuffle.partitions", cpus),
      s"local[$cpus]")).getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    def stream = spark.range(rows).select(
      pmod(col("id"), lit(groups)).as("src"),
      col("id").as("dst"),
      (pmod(col("id") * lit(2654435761L), lit(1000000007L)).cast("double") /
        lit(1000000007.0)).as("sv"))
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      System.err.println(f"[topk] $name ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    // warm both paths small
    time("warm_agg") {
      stream.limit(100000).groupBy(col("src"))
        .agg(call_function("graft_topk_pairs", col("dst"), col("sv"), lit(k)).as("n"))
        .select(sum(size(col("n")))).collect().head.getLong(0)
    }
    time("warm_win") {
      val w = Window.partitionBy(col("src")).orderBy(col("sv").desc, col("dst"))
      stream.limit(100000).withColumn("rn", row_number().over(w)).filter(col("rn") <= k).count()
    }
    time("agg_topk") {
      // consume the array: a bare count() PRUNES unused aggregate
      // expressions and silently times distinct(src) instead (that pruning
      // is how every early "agg wins" reading in this round was wrong)
      stream.groupBy(col("src"))
        .agg(call_function("graft_topk_pairs", col("dst"), col("sv"), lit(k)).as("n"))
        .select(sum(size(col("n")))).collect().head.getLong(0)
    }
    time("window_topk") {
      val w = Window.partitionBy(col("src")).orderBy(col("sv").desc, col("dst"))
      stream.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).count()
    }
    // Same aggregate, but with q_mutual_knn's REAL stage shape emulated:
    // two 64-element array columns and a graft_dot in the same fused stage
    // as the partial agg. If agg_topk is fast and agg_fat_stage collapses,
    // the regression is generated-method size (JIT refuses huge methods
    // SILENTLY below Spark's hugeMethodLimit warning), not the aggregate.
    val fat = stream
      .withColumn("ea", expr("transform(sequence(0, 63), d -> cast(pmod(dst + d, 97) as double) / 97.0)"))
      .withColumn("eb", expr("transform(sequence(0, 63), d -> cast(pmod(dst * 2 + d, 89) as double) / 89.0)"))
      .withColumn("sv2", call_function("graft_dot", col("ea"), col("eb")))
      .filter(col("sv2") > -999.0)
      .select(col("src"), col("dst"), col("sv2").as("sv"))
    time("agg_fat_stage") {
      fat.groupBy(col("src"))
        .agg(call_function("graft_topk_pairs", col("dst"), col("sv"), lit(k)).as("n"))
        .select(sum(size(col("n")))).collect().head.getLong(0)
    }
    time("window_fat_stage") {
      val w = Window.partitionBy(col("src")).orderBy(col("sv").desc, col("dst"))
      fat.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).count()
    }
    spark.stop()
  }
}
