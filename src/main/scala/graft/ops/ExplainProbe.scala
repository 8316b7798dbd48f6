package graft.ops

import org.apache.spark.sql.SparkSession

import graft.{GraftExtensions, GraftSession, SparkEntry}

/** Print the formatted physical plan of any registry query against any data
  * dir WITHOUT running it — the plan-reading loop the build brief prescribes
  * (`.explain("formatted")` and iterate), as a one-liner:
  *
  *   `sbt "runMain graft.ops.ExplainProbe q_mutual_knn /tmp/graft100x_emb"`
  *
  * Round-14 provenance: the mutual-kNN plan printed here is what exposed
  * the self-join materializing the whole candidate pipeline once per side
  * (two complete Union-of-SMJ copies) — the composition bug wall-clock
  * probes alone could not attribute. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val key = args.headOption.getOrElse("q_mutual_knn")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(key,
      throw new IllegalArgumentException(
        s"unknown query '$key' — keys come from SparkEntry.queries"))
    val spark = GraftSession.tune(GraftSession.withMaster(
      SparkSession.builder().config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")),
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")).getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    // `exec` as the third arg RUNS the query first and prints the
    // AQE-FINALIZED plan (round-15): runtime join demotions/conversions
    // (SMJ→BHJ, SMJ→SHJ via maxShuffledHashJoinLocalMapThreshold) are
    // invisible in the static plan, and reading them is exactly the
    // feedback loop the AQE-delegated join strategy needs.
    val df = fn(spark, dir)
    if (args.lift(2).contains("exec")) {
      // drive THIS Dataset's own queryExecution (df.count() would build a
      // separate aggregate execution and leave this one un-finalized);
      // the RDD count materializes every stage without shipping rows to
      // the driver, and the print below shows the FINAL adaptive plan.
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
