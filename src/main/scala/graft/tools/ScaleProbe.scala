package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, GraftSession, SparkEntry}

/** Data-sized scaling probe (round-6 advice #4): the sf0.01→sf0.1 probes are
  * machinery-bound, so this main manufactures a COPIES× blow-up of the
  * data-sized tables at `outDir` and times the heavy keys at both scales,
  * printing per-key growth factors. A key whose growth factor tracks the
  * data factor (~linear) has no super-linear shuffle/pair/loop term hiding
  * behind the small-SF machinery floor; one that grows faster needs a plan
  * fix or a documented cap.
  *
  * Blow-up construction — COPIES disjoint translates, deliberately:
  *   - `documents`: per-copy word prefix `c<k>·` (disjoint shingle/minhash/
  *     simhash space — within-copy dup structure preserved exactly, ZERO
  *     cross-copy near-dup pairs, so true pair counts scale ×COPIES and any
  *     super-linear candidate growth is the ALGORITHM's, not planted by the
  *     replication), doc_id translated by a stride; n_chars recomputed.
  *   - `events`: event_id/user_id translated — COPIES disjoint user/sensor
  *     universes for the behavior/stream/timeseries folds.
  *   - `orders`/`lineitem`: order/customer/supplier keys translated —
  *     COPIES disjoint trade-graph components for PageRank/BFS/CC.
  *   - dimension tables + embeddings: symlinked unchanged.
  *
  * Run: `sbt "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 /tmp/sfx10"`
  * (optionally: copies, then key names). Results go to stdout as one JSON
  * line per key; record the growth factors in BASELINE.md. */
object ScaleProbe {

  /** doc_id / user_id / order-key translation stride per copy — far above
    * any real id in the corpus. */
  val Stride = 10000000L

  val DefaultKeys: Seq[String] = Seq(
    "q_dedup_ngram_jaccard", "q_minhash_lsh", "q_containment_dedup",
    "q_simhash_pairs", "q_curation_cc", "q_source_overlap",
    "q_pagerank", "q_bfs_frontier", "q_kcore", "q_stream_pipeline")

  private def blowUpDocuments(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    val d = spark.read.parquet(s"$src/documents.parquet")
    val copiesDf = (0 until copies).map { k =>
      d.select(
        (col("doc_id") + lit(k * Stride)).as("doc_id"),
        // prefix EVERY word: the copy's token space is fully disjoint, so
        // no shingle, minhash band, or simhash plane collides across copies
        array_join(transform(split(col("text"), " "),
          w => concat(lit(s"c$k"), w)), " ").as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionByName _)
    copiesDf.withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  private def blowUpEvents(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    val e = spark.read.parquet(s"$src/events.parquet")
    (0 until copies).map { k =>
      e.withColumn("event_id", col("event_id") + lit(k * Stride))
        .withColumn("user_id", col("user_id") + lit(k * Stride))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  private def blowUpTrade(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    val o = spark.read.parquet(s"$src/orders.parquet")
    (0 until copies).map { k =>
      o.withColumn("o_orderkey", col("o_orderkey") + lit(k * Stride))
        .withColumn("o_custkey", col("o_custkey") + lit(k * Stride))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val l = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until copies).map { k =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(k * Stride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * Stride))
        .withColumn("l_partkey", col("l_partkey") + lit(k * Stride))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
  }

  private def blowUpEmbeddings(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    // vec_id translated per copy; each copy multiplied by a deterministic
    // per-copy DIAGONAL ±1 matrix (signs from hash(copy, dim index)) — an
    // orthogonal transform preserves every within-copy dot product (pair
    // structure, centroid geometry scale exactly ×COPIES) while
    // decorrelating copies from each other and from the fixed hyperplanes,
    // so LSH buckets don't systematically collide across copies (identical
    // copies would: signatures are functions of the vector alone, and a
    // shared bucket turns the ×COPIES blow-up quadratic). The former cyclic
    // rotation silently repeated past copy index 64 (slice degenerated to
    // the identity — round-7 advice); the 2^64 sign patterns cannot repeat
    // for any realistic copy count.
    val e = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until copies).map { k =>
      val signed =
        if (k == 0) e
        else e.withColumn("embedding", expr(
          s"transform(embedding, (x, i) -> if(pmod(hash($k, i), 2) = 0, x, -x))"))
      signed.withColumn("vec_id", col("vec_id") + lit(k * Stride))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Which table groups to blow up; the rest are symlinked 1×. A probe of
    * one family doesn't need 100× copies of every table — e.g. the
    * streaming-state probe (round-8 verdict #3) reads only `events`, and
    * manufacturing 100× documents/embeddings for it would cost more disk
    * and time than the probe itself. */
  val AllGroups: Set[String] = Set("documents", "events", "trade", "embeddings")

  def generate(spark: SparkSession, src: String, out: String,
      copies: Int, groups: Set[String] = AllGroups): Unit = {
    Files.createDirectories(Paths.get(out))
    if (groups("documents")) blowUpDocuments(spark, src, out, copies)
    if (groups("events")) blowUpEvents(spark, src, out, copies)
    if (groups("trade")) blowUpTrade(spark, src, out, copies)
    if (groups("embeddings")) blowUpEmbeddings(spark, src, out, copies)
    val linked = Seq("region", "nation", "customer", "supplier", "part") ++
      (AllGroups -- groups).toSeq.flatMap {
        case "documents" => Seq("documents")
        case "events" => Seq("events")
        case "trade" => Seq("orders", "lineitem")
        case "embeddings" => Seq("embeddings")
      }
    linked.foreach { t =>
      val link = Paths.get(s"$out/$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link, Paths.get(s"$src/$t.parquet"))
    }
    // The out dir's contents just changed. Two memo layers are now stale
    // (round-16 advice): any bigInputs verdict probed against a
    // half-populated (or prior-generation) state, AND any Staged derived
    // tables (trade_edges, coorder_edges, jaccard_pairs, …) already built
    // for this dir in this JVM — those memoized frames/parquet scratch
    // would keep serving pre-regeneration rows. Staged.clear drops the
    // whole registry (it also invalidates bigInputs internally); a
    // dir-targeted eviction isn't worth the bookkeeping for a probe-tool
    // path that regenerates at most a handful of times per process.
    graft.ops.Staged.clear(spark)
  }

  private def time(fn: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = fn
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sfx10")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val keys = if (args.length > 3) args.drop(3).toSeq else DefaultKeys
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B knobs (e.g. statePartitions or the RocksDB state-store provider,
    // round-8 verdict #3) come via SPARK_GRAFT_CONF="k=v;…", applied by
    // GraftSession.tune — the ONE parser every entry point shares (r13).
    val builder = GraftSession.tune(GraftSession.withMaster(
      SparkSession.builder()
        .config("spark.sql.shuffle.partitions", cpus),
      s"local[$cpus]"))
    val spark = builder.getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_BLOWUP=events (comma-list of documents|events|trade|
    // embeddings) blows up just those groups and symlinks the rest 1×.
    val groups = sys.env.get("SPARK_GRAFT_BLOWUP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(AllGroups)
    require(groups.subsetOf(AllGroups), s"unknown blow-up group in $groups")
    // A partial blow-up with the DEFAULT key list would time keys over 1×
    // symlinks and print growth ≈ 1.0 — reading as "scales perfectly" when
    // nothing was tested (round-9 review). Partial groups therefore demand
    // explicitly chosen keys, and the 1×-symlinked groups are named loudly
    // so a key/group mismatch is the caller's visible decision.
    if (groups != AllGroups) {
      require(args.length > 3,
        s"SPARK_GRAFT_BLOWUP=${groups.mkString(",")} symlinks " +
          s"${(AllGroups -- groups).mkString("/")} at 1x - pass the key " +
          "names that read the blown-up groups explicitly")
      System.err.println(s"[scaleprobe] NOTE: ${(AllGroups -- groups).toSeq.sorted
        .mkString(", ")} are 1x symlinks; keys reading them will show ~1x " +
        "growth by construction")
    }
    // A marker records WHAT a populated out dir holds. Generation is
    // skipped only on an exact (copies, groups) match; any other populated
    // state fails loudly — keying the skip on one table's existence let a
    // re-run with a different SPARK_GRAFT_BLOWUP silently probe 1×
    // symlinks as if they were blown up (round-9 review).
    val marker = Paths.get(s"$out/_blowup_marker")
    val stamp = s"copies=$copies;groups=${groups.toSeq.sorted.mkString(",")}"
    if (Files.exists(marker)) {
      val found = new String(Files.readAllBytes(marker), "UTF-8")
      require(found == stamp,
        s"$out already holds a different blow-up ($found vs requested " +
          s"$stamp) — use a fresh out dir or delete this one")
    } else {
      require(!Files.exists(Paths.get(s"$out/documents.parquet")),
        s"$out is populated but has no blow-up marker (pre-round-9 dir?) " +
          "— use a fresh out dir")
      generate(spark, src, out, copies, groups)
      Files.write(marker, stamp.getBytes("UTF-8"))
    }
    // SPARK_GRAFT_TEARDOWN=1 (round-14 verdict, same knob as Bench): also
    // drop the Staged prefix tables and force a GC between timings, so each
    // reading carries isolated-run semantics instead of amortizing staged
    // builds / accumulating block-manager residue across keys.
    val teardown = sys.env.get("SPARK_GRAFT_TEARDOWN")
      .exists(v => v == "1" || v == "true")
    def clean(): Unit = {
      if (teardown) graft.ops.Staged.clear(spark)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (teardown || !graft.ops.Staged.pinned(id))
            rdd.unpersist(blocking = teardown) }
      if (teardown) System.gc()
    }
    keys.foreach { name =>
      val fn = SparkEntry.queries(name)
      val (t1, n1) = time(fn(spark, src).count()); clean()
      val (tx, nx) = time(fn(spark, out).count()); clean()
      println(s"""{"key":"$name","sec_1x":$t1,"rows_1x":$n1,""" +
        s""""sec_${copies}x":$tx,"rows_${copies}x":$nx,""" +
        s""""growth":${math.rint(tx / t1 * 100) / 100}}""")
    }
    spark.stop()
  }
}
