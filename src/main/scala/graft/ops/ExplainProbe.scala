package graft.ops
import org.apache.spark.sql.SparkSession
import graft.{GraftExtensions, GraftSession}
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.tune(GraftSession.withMaster(
      SparkSession.builder().config("spark.sql.shuffle.partitions", "32"),
      "local[32]")).getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    VectorQueries.mutualKnn(spark, dir).explain("formatted")
    spark.stop()
  }
}
