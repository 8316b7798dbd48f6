package graft.tools

import java.nio.file.{Files, Paths}

import graft.{GraftExtensions, GraftSession, SparkEntry}

/** Writes `.explain("formatted")` for named query keys to files — the plan
  * evidence the optimization rounds commit under `plans/r<N>/`.
  *
  * Run: `sbt "runMain graft.tools.PlanDump <outDir> <suffix> q_a q_b ..."`
  * → `<outDir>/q_a_<suffix>.txt` etc. Data dir from `SPARK_GRAFT_SF_DIR`
  * (default sf0.1). Queries are only PLANNED, never executed — keys whose
  * builder itself runs jobs (staged builds, streaming replays) still
  * execute that prefix, which is what makes their final plan resolvable. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <key>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val keys = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("plandump")
    keys.foreach { k =>
      val fn = SparkEntry.queries.getOrElse(k,
        sys.error(s"unknown query key $k"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${k}_$suffix.txt"), plan)
      System.err.println(s"[plandump] wrote ${k}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
