package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Batch MERGE INTO (keyed upsert) for a bare-parquet table — the engine's
  * answer to `MERGE INTO t USING u ON t.k = u.k WHEN MATCHED UPDATE WHEN NOT
  * MATCHED INSERT` without an ACID table format in the container.
  *
  * Mechanism: bucketed copy-on-write. Keys hash into a fixed number of
  * bucket partitions; a merge rewrites ONLY the buckets the update batch
  * touches (existing bucket rows minus the batch's keys, union the batch,
  * dynamic-partition overwrite). Work per merge is O(affected buckets +
  * batch), never O(table). Re-running the same merge rewrites the same
  * buckets to identical content — idempotent, which is what lets the
  * streaming changelog sink ([[graft.streaming.SensorPipeline.upsertBatch]],
  * the original home of this logic) claim exactly-once.
  *
  * The bucket count used at table CREATION is persisted in a
  * `_graft_buckets` marker next to the data and wins on every later merge:
  * the bucket column is part of the on-disk layout, so a drifted count
  * would hash keys into different buckets and the left-anti merge (which
  * only reads AFFECTED buckets) would let an old copy of a key survive.
  * A `requestedBuckets` that disagrees with an existing marker fails
  * loudly — resizing requires a rebuild.
  *
  * Contract: `updates` carries at most one row per key (last-write-wins
  * semantics are the CALLER's dedup — e.g. update-mode streaming output, or
  * an argmax over a CDC feed); enforcing uniqueness here would cost a
  * full-batch shuffle per merge. At 100 TB, size buckets ≈ keys / 50k
  * (measured: ChangelogProbe in BASELINE.md) so a bucket rewrite stays
  * bounded as the table grows. */
object Merge {

  /** Historical fixed default, kept as the auto-sizing CAP interaction
    * anchor in docs/tests; new tables derive their count from the first
    * batch instead (see [[autoBuckets]]). */
  val DefaultBuckets = 32

  /** Target keys per bucket for the auto-derived layout — the measured
    * ChangelogProbe rule (BASELINE.md: buckets ≈ keys / 50 k keeps one
    * bucket's copy-on-write rewrite bounded as the table grows). */
  val KeysPerBucket = 50000L

  /** Auto-derivation cap: past ~4 k bucket directories the per-merge commit
    * machinery (listing + dynamic-partition renames) dominates; a table
    * that big should size its layout explicitly from expected cardinality. */
  val MaxAutoBuckets = 4096

  private val BucketsMarker = "_graft_buckets"

  /** Bucket count for a NEW table when the caller pinned nothing: the
    * keys/50 k rule applied to the creating batch (updates carry ≤ 1 row
    * per key, so its row count IS its key count). Round-18, replacing the
    * fixed 32: at small cardinality 32 buckets meant every merge paid 32
    * file writes + commits for kilobytes of data (sf0.1 A/B over the six
    * table-format keys: family CPU 44 → 22 cpu-s, task-time 25 → 14 s),
    * while at 100 TB cardinality 32 buckets would be far too FEW — the
    * fixed constant was wrong in both directions. First-batch derivation
    * assumes the creating batch is representative of steady-state
    * cardinality (true for the replay/demo tables here); a table whose
    * first batch is a non-representative sliver should pin the count
    * explicitly, exactly as production deployments are documented to do. */
  def autoBuckets(firstBatchRows: Long): Int =
    math.min(MaxAutoBuckets.toLong,
      math.max(1L, (firstBatchRows + KeysPerBucket - 1) / KeysPerBucket)).toInt

  /** Persisted marker if present (cross-checked against an explicit
    * request), else the request, else the first-batch derivation.
    * Driver-side metadata, a few bytes. Shared with [[TimeTravel]] (round-18
    * ADVICE: one marker read/cross-check, one exception type). */
  private[tables] def resolveBuckets(
      fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path,
      markerExists: Boolean,
      requested: Option[Int],
      firstBatchRows: Long): Int = {
    if (markerExists) {
      val in = fs.open(marker)
      val persisted =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      requested.filter(_ != persisted).foreach { r =>
        throw new IllegalStateException(
          s"table at $marker was created with $persisted buckets but the " +
            s"merge requested $r; resizing an existing table requires a " +
            "rebuild (the bucket column is baked into the on-disk layout)")
      }
      persisted
    } else requested.getOrElse(autoBuckets(firstBatchRows))
  }

  /** Write the layout marker (overwriting any partial file from a crashed
    * attempt). Shared with [[TimeTravel]]. */
  private[tables] def pinMarker(fs: org.apache.hadoop.fs.FileSystem,
      marker: org.apache.hadoop.fs.Path, n: Int): Unit = {
    val out = fs.create(marker, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** True iff the table holds COMMITTED data: at least one bucket partition
    * directory. A bare `fs.exists(dir)` is wrong twice over — a crashed
    * first write leaves a `_temporary`-only directory (whose "existing
    * table" read would fail forever on retry), and the marker file itself
    * creates the directory. */
  private def hasData(fs: org.apache.hadoop.fs.FileSystem,
      tableP: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(tableP) && fs.listStatus(tableP)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))

  /** Upsert `updates` into the keyed parquet table at `tablePath` (created
    * on first call). Every non-key column of `updates` replaces the stored
    * row's value — full-row upsert, the update-mode-changelog contract.
    *
    * Concurrency contract: ONE writer per table. Merges are idempotent
    * under sequential RETRY (the streaming sink's fault model), but two
    * CONCURRENT merges read-modify-write the same bucket directories and
    * the last commit wins — lost updates, no error. Serializing writers is
    * the caller's job (a streaming query does it by construction; ad-hoc
    * batch writers need external coordination — cross-writer locking is an
    * ACID table format's department, not bare parquet's). */
  def mergeInto(tablePath: String, updates: DataFrame, keyCols: Seq[String],
      requestedBuckets: Option[Int] = None): Unit = {
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    require(!updates.columns.contains("bucket"),
      "updates must not carry a 'bucket' column (reserved for the layout)")
    require(keyCols.forall(updates.columns.contains),
      s"updates is missing key column(s): ${keyCols.filterNot(updates.columns.contains)}")
    val spark = updates.sparkSession
    val tableP = new org.apache.hadoop.fs.Path(tablePath)
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markerP = new org.apache.hadoop.fs.Path(tableP, BucketsMarker)
    val tableExists = hasData(fs, tableP)
    // Cache the updates FIRST: under foreachBatch every action re-executes
    // the batch plan (for a stateful query, the whole shuffle + state-store
    // pass) — uncached, the emptiness probe, the affected-bucket scan, and
    // the merge would each pay it (measured 2× the batch cost at sf0.1).
    // Cached BEFORE the bucket projection so the auto-sizing count and the
    // keyed frame share one materialization.
    val base = updates.persist()
    try {
      // count(), not isEmpty(): the emptiness probe is a limit-1 partial
      // execution that caches only the partitions it touches; one count
      // fully populates the cache in a single pass. It doubles as the
      // auto-sizing cardinality (≤ 1 row per key is the updates contract).
      val nRows = base.count()
      // An empty batch touches nothing — including the layout marker: the
      // first NON-empty batch is what pins (and auto-sizes) the layout.
      if (nRows == 0L) return
      val nBuckets =
        resolveBuckets(fs, markerP, fs.exists(markerP), requestedBuckets, nRows)
      // Pin the layout BEFORE the first data write: a crash between the two
      // must leave a marker without data (harmless — the next run reads the
      // pinned count and takes the create path), never data without a marker
      // (fatal — a later run could adopt a DIFFERENT count and the left-anti
      // merge would silently keep stale old-scheme copies of updated keys).
      if (!fs.exists(markerP)) pinMarker(fs, markerP, nBuckets)
      val keyed = base
        .withColumn("bucket", pmod(hash(keyCols.map(col): _*), lit(nBuckets)))
      val merged = if (tableExists) {
        // Affected-bucket set is ≤ nBuckets values — a bounded driver
        // decision, not a data collect.
        val affected = keyed.select(col("bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq
        spark.read.parquet(tablePath)
          .filter(col("bucket").isin(affected: _*))
          .join(keyed.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(keyed)
      } else keyed
      // Materialize before the overwrite (the merged plan reads the same
      // files the write truncates). localCheckpoint, NOT persist+count: a
      // persist's cache is evictable, and on a multi-executor cluster an
      // executor lost after the dynamic-partition commit starts replacing
      // bucket directories would silently RECOMPUTE evicted partitions from
      // partially-rewritten input; localCheckpoint truncates lineage, so a
      // lost replica fails the job loudly (retry the idempotent merge)
      // instead of committing corrupt data. Repartition on the bucket key so
      // each bucket directory gets ONE file per rewrite instead of one per
      // task (small-file explosion + ~2 s commit overhead measured at sf0.1).
      val snap = merged.repartition(nBuckets, col("bucket")).localCheckpoint()
      snap.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(tablePath)
      snap.unpersist()
    } finally base.unpersist()
  }
}
