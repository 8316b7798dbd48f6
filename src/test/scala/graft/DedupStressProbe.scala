package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.DedupQueries
import graft.tables.Tables

/** Measurement harness for the dup-heavy worst case (BASELINE.md "dup-heavy
  * stress probe"): the round-3 probe established that at 10 near-copies per
  * doc the all-pairs n-gram Jaccard generator costs ~90 s (the documented
  * O(df²) trade) while MinHash hashing stays linear — and declared that the
  * intended 100 TB path is "MinHash-LSH as generator, pairwise Jaccard as
  * the verify stage on candidates". That path now exists
  * ([[DedupQueries.dedupVerified]]); this probe times it on the same
  * corpus shape so the claim carries a number.
  *
  * Staging: every document duplicated `copies`× with distinct doc_ids; each
  * copy k > 0 gets k extra trailing tokens, so copies are NEAR-dups (a few
  * shingles differ) rather than byte dups — the case banding must survive.
  *
  * Run: `sbt "Test/runMain graft.DedupStressProbe <sfDir> <copies>"`
  * Results recorded in BASELINE.md. */
object DedupStressProbe {

  def stage(spark: SparkSession, dir: String, outDir: String, copies: Int): Long = {
    val docs = Tables(spark, dir).documents
    val staged = (0 until copies).map { k =>
      val suffix = if (k == 0) "" else (1 to k).map(i => s" v$i").mkString
      docs.select(
        (col("doc_id") * copies + k).as("doc_id"),
        concat(col("text"), lit(suffix)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    staged.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    spark.read.parquet(s"$outDir/documents.parquet").count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)

    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[${GraftSession.defaultParallelism}]")
      .appName("graft-dedup-stress-probe")
      .config("spark.sql.shuffle.partitions", GraftSession.defaultParallelism))
      .getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("graft_dedup_stress").toString
    val nDocs = stage(spark, sfDir, base, copies)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // generator+verify path (the production shape)
    val (nVerified, tVerified) = time(
      DedupQueries.dedupVerified(spark, base, minJaccard = 0.8).count())
    // generator-only, for the candidate count the verify stage paid for
    val (nCand, tCand) = time(DedupQueries.minhashLsh(spark, base).count())
    println(s"""{"probe":"dedup_stress","sf":"$sfDir","copies":$copies,""" +
      s""""docs":$nDocs,"candidates":$nCand,"verified":$nVerified,""" +
      s""""lsh_sec":${f"$tCand%.1f"},"lsh_verify_sec":${f"$tVerified%.1f"}}""")
    spark.stop()
  }
}
