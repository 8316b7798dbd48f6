package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(GraftSession.withMaster(
      SparkSession.builder()
        .config("spark.sql.shuffle.partitions", cpus),
      s"local[$cpus]"))
      .getOrCreate()
    GraftExtensions.ensureRegistered(spark)
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session so the first timed query measures the query, not JVM
    // startup. The range/parquet pass warms the basics, but the heavy paths
    // (digest kernels, LSH banding, broadcast + window exec) JIT lazily —
    // measured ~6-7 s absorbed by whichever query ran first before the
    // representative sf0.001 warmup runs below were added.
    spark.range(1000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/nation.parquet").count()
    catch { case t: Throwable =>
      System.err.println(s"[bench] WARMUP FAILED nation scan: ${t.getClass.getSimpleName}")
    }
    // Warmup runs at the smallest SF alongside the bench dir (sf0.1 →
    // sibling sf0.001) so a relocated testdata root doesn't silently skip
    // warmup; a failed warmup query logs loudly — silence here would
    // quietly reintroduce the ~6-7 s first-query JIT bias.
    val warmDir = new java.io.File(sfDir).getParent + "/sf0.001"
    Seq("q_minhash_lsh", "q_dedup_embedding", "q_join_broadcast", "q_window_rank",
        "q_curation_cc")
      .foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case t: Throwable =>
          System.err.println(s"[bench] WARMUP FAILED $n: ${t.getClass.getSimpleName}: ${t.getMessage}")
        }
      }
    spark.sharedState.cacheManager.clearCache()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q_a,q_b times just those.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    // Per-key teardown (round-14 verdict "what's wrong" #2, opt-in):
    // SPARK_GRAFT_TEARDOWN=1 drops the staged prefix tables, unpersists
    // everything, and forces a driver GC between keys so ContextCleaner
    // reclaims dead shuffle/broadcast state — in-sweep numbers then carry
    // isolated-run semantics (every key pays its own staged build, no
    // block-manager residue from earlier keys; at 100× the residue
    // inflated q_kcore up to 3× in-sweep vs isolated). OFF by default:
    // the sf0.1 sweep protocol and its quiescent bands amortize staged
    // prefixes across each family, and regenerating them per key would
    // change what the bands measure. Teardown runs OUTSIDE the timed
    // window — an isolated run doesn't pay another key's GC.
    val teardown = sys.env.get("SPARK_GRAFT_TEARDOWN")
      .exists(v => v == "1" || v == "true")
    // Deterministic order in only-mode so A/B hotspot comparisons aren't
    // confounded by hash-map iteration putting a different query first
    // (the first query absorbs residual JIT/codegen warmup).
    val selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      SparkEntry.queries
        .filter { case (n, _) => only.isEmpty || only(n) }
        .toSeq.sortBy(_._1)
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed query must be VISIBLE in the output (round-4 review: the
      // old swallow-to--1L benched a broken query as ~0 s with rc=0).
      val err = try { fn(spark, sfDir).count(); None } catch {
        case t: Throwable =>
          System.err.println(s"[bench] QUERY FAILED $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
          Some(t.getClass.getSimpleName)
      }
      // Signature-table persists (dedup/vector queries) are per-plan and
      // never unpersisted by the builders; drop them between queries so the
      // 60+-query run doesn't accumulate cached partitions. localCheckpoint
      // RDDs (the iterative graph/CC queries) register as persistent RDDs
      // outside the SQL cache — drop those too, or a 180-key sweep carries
      // every round's checkpoint blocks forward and evicts live state.
      spark.sharedState.cacheManager.clearCache()
      // Staged prefix tables (ops.Staged) are process-level by design —
      // evicting them here would force every family key to rebuild them.
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) =>
          if (!ops.Staged.pinned(id)) rdd.unpersist(blocking = false) }
      val sec = (System.nanoTime() - t0) / 1e9
      if (teardown) {
        ops.Staged.clear(spark)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs
          .foreach { case (_, rdd) => rdd.unpersist(blocking = true) }
        System.gc() // ContextCleaner reclaims dead shuffles/broadcasts on GC
      }
      // Per-key progress on stderr (stdout stays the one-JSON-line
      // contract): a multi-hour blown-up-scale sweep is otherwise a black
      // box — a timeout kill salvages nothing and leaves no clue WHICH key
      // ground (round-14: a 59-key 100x sweep died at 50 min with zero
      // attribution). The f-interpolator's locale sensitivity is fine here,
      // this line is for humans, never parsed.
      System.err.println(f"[bench] done $name $sec%.2f s")
      (name, sec, err)
    }
    val qs = results.map { case (k, v, e) =>
      "\"" + k + "\":" + e.map(_ => "-1").getOrElse(v.toString)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
    val errField =
      if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    // Self-annotating load detection (round-8 verdict #7): compare each key
    // against the checked-in quiescent reference (tools/bench_bands.json, a
    // copy of a clean closing sweep's per-query record). A key ≥3× its
    // quiescent time AND ≥2 s absolute is flagged as LOAD-SUSPECT in BOTH
    // records (the durable full file and the compact tail line — the full
    // file is what bands are regenerated from, so it must carry the flag
    // too; round-9 review), so a driver sweep taken under box load reads
    // as "re-measure isolated" instead of as a regression — BASELINE.md's
    // compare-isolated-medians rule, machine-applied.
    // Project-root resolution (round-9 advice + round-10 review): CWD-
    // relative paths silently disabled the LOAD-SUSPECT annotation (and
    // misplaced the full record) when Bench ran from any other directory.
    // Walk up from the CWD to the nearest ancestor holding build.sbt; both
    // the band read and the bench_full.json write resolve against it.
    val projectRoot: java.io.File = GraftSession.projectRoot
    val bandsFile: java.io.File = sys.env.get("SPARK_GRAFT_BANDS")
      .map(new java.io.File(_))
      .getOrElse(new java.io.File(projectRoot, "tools/bench_bands.json"))
    val bands: Map[String, Double] =
      try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(bandsFile).get("queries")
        val it = node.fields()
        val m = scala.collection.mutable.Map.empty[String, Double]
        while (it.hasNext) { val e = it.next(); m(e.getKey) = e.getValue.asDouble() }
        m.toMap
      } catch { case t: Throwable =>
        System.err.println(s"[bench] no band reference at $bandsFile (${t.getClass.getSimpleName}) — skipping load annotation")
        Map.empty
      }
    // Per-key suspects get the same teardown treatment as the sweep
    // fingerprint (round-15 advice): under SPARK_GRAFT_TEARDOWN each key
    // pays its full staged-prefix build while the bands were cut amortized,
    // so a key reading 3x its band is the protocol, not host load — emit
    // nothing rather than mislabel it.
    val suspects = if (teardown) Nil else results.collect {
      case (k, v, None) if bands.get(k).exists(b => b > 0 && v >= 3 * b && v >= 2.0) =>
        (k, v, bands(k))
    }.sortBy { case (_, v, b) => -(v / b) }
    suspects.foreach { case (k, v, b) =>
      System.err.println(f"[bench] LOAD-SUSPECT $k: $v%.2f s in-sweep vs $b%.2f s quiescent reference (${v / b}%.1fx) - re-measure isolated before reading this as a regression")
    }
    val suspectField =
      if (suspects.isEmpty) ""
      else suspects.take(5).map { case (k, v, b) =>
        // Double.toString, not %.2f: the f-interpolator is locale-sensitive
        // and a comma decimal separator would corrupt the JSON line
        s""""$k":{"sweep":${math.rint(v * 100) / 100},"quiescent":${math.rint(b * 100) / 100}}"""
      }.mkString(""","load_suspects":{""", ",", "}")
    // Sweep-level box fingerprint (round-13 verdict "What's wrong" #1): the
    // per-key LOAD-SUSPECT gate (3x AND 2 s) can only catch individual
    // outliers, but a throttled host inflates EVERY key by a near-uniform
    // factor — the r13 driver sweep was median 1.615x across all 276 keys
    // with only 2 keys tripping the per-key gate. The median and p90 of the
    // per-key sweep/quiescent ratios are computable for free against the
    // same bands file, and a median past ~1.25 is the documented host-load
    // signature (code regressions are key-specific, load is uniform — the
    // BASELINE.md compare-isolated-medians rule, now emitted in-record so a
    // degraded driver sweep self-reports its regime).
    val ratios = results.collect {
      case (k, v, None) if bands.get(k).exists(_ > 0) => v / bands(k)
    }.sorted
    val fingerprintField =
      if (ratios.isEmpty) ""
      else {
        val med = ratios(ratios.size / 2)
        val p90 = ratios(math.min(ratios.size - 1, (ratios.size * 9) / 10))
        // flag only on real sweeps: a 3-key SPARK_GRAFT_ONLY subset's median
        // is dominated by residual first-query JIT (measured 2.85x on a
        // quiescent box) and would cry wolf on every local iteration loop.
        // Under per-key TEARDOWN the fingerprint is not meaningful at all —
        // the bands were cut with staged-prefix amortization, so a teardown
        // sweep reads uniformly high BY CONSTRUCTION (measured median 3.25
        // on the round-15 family sweep); the record says so itself.
        val degraded = med >= 1.25 && ratios.size >= 20 && !teardown
        if (degraded)
          System.err.println(f"[bench] SWEEP LOAD-SUSPECT: median per-key ratio $med%.3f vs quiescent bands (p90 $p90%.3f, n=${ratios.size}) - uniform inflation is host load, not a code regression; re-measure on a quiescent box")
        s""","box_fingerprint":{"median_ratio":${math.rint(med * 1000) / 1000},"p90_ratio":${math.rint(p90 * 1000) / 1000},"n":${ratios.size},"sweep_load_suspect":$degraded${if (teardown) ",\"teardown\":true,\"bands_comparable\":false" else ""}}"""
      }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errField$suspectField$fingerprintField,"sf":"$sfDir"}"""
    println(line)
    // The driver tail-captures stdout at ~2000 chars, which front-truncates
    // the full per-query map on a 235-key run (~7 KB) — BENCH_r06 recorded
    // "parsed": null because no complete JSON line survived in the tail.
    // The file copy keeps the full record reachable, and a COMPACT line
    // (total + the slowest keys, well under the tail window) is printed
    // LAST so the driver always has one complete parseable line.
    val outP = new java.io.File(projectRoot, "target/bench_full.json").toPath
    try {
      java.nio.file.Files.createDirectories(outP.getParent)
      java.nio.file.Files.writeString(outP, line + "\n")
      System.err.println(s"[bench] full record: ${outP.toAbsolutePath}")
    } catch { case t: Throwable =>
      System.err.println(s"[bench] could not write $outP: ${t.getMessage}")
    }
    val slowest = results.filter(_._3.isEmpty).sortBy(-_._2).take(15)
      .map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // full_record carries the RESOLVED absolute path: a CWD-relative
    // pointer would be wrong exactly in the run-from-elsewhere case the
    // projectRoot resolution exists for (round-10 review)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$slowest$errField$suspectField$fingerprintField,"sf":"$sfDir","n_queries":${results.size},"queries_truncated_to_slowest":15,"full_record":"${outP.toAbsolutePath}"}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
