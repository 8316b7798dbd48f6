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
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
