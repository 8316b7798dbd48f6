package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * startup dominates test time otherwise). Mirrors the Verify/Bench configs
  * so tests exercise the same planner behavior the driver gate sees. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession.local("graft-test", cores = 4)
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite with Matchers {
  def spark: SparkSession = SparkSpec.spark
  def sf: String = SparkSpec.sf

  /** Rows of a single-column-ordered query as Seq of Seq (null-safe). */
  def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(i => r.get(i)))

  /** The physical plan as text, for plan-shape assertions (broadcast used,
    * filter pushed down, etc.). */
  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString
}
