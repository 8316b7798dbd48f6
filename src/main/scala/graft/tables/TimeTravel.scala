package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Snapshot versioning (time travel) for the bucketed keyed table —
  * manifest-based, the Iceberg/Delta idea re-expressed over bare parquet:
  *
  *   - data files are IMMUTABLE: merge `v` writes the buckets it touches
  *     under `files/v<v>/bucket=K/` and never rewrites an older version's
  *     files (contrast [[Merge.mergeInto]], which overwrites in place and
  *     therefore keeps only the latest state);
  *   - a manifest per version (`_manifests/v<v>`, driver-side metadata of
  *     ≤ nBuckets lines `bucket,version`) records, for every bucket, which
  *     version's directory holds its CURRENT file — so manifest `v` IS the
  *     table as of merge `v`, reconstructible forever (until vacuumed);
  *   - per-merge work is O(affected buckets + batch), same economics as
  *     the in-place merge: untouched buckets are carried forward in the
  *     manifest as a POINTER, zero data movement.
  *
  * Readers never race writers: a reader resolves one immutable manifest
  * and reads only immutable files, so `readAt` is consistent without any
  * locking — the property that makes manifest-based formats the 100 TB
  * standard. The crash contract is manifest-last: data files for version v
  * land before manifest v, so a crash between the two leaves an orphan
  * file directory (harmless: the version was never committed, and the
  * retry overwrites it) and never a manifest pointing at missing files.
  * Writer concurrency is single-writer, as [[Merge]] documents.
  *
  * [[vacuum]] drops file directories no retained manifest references —
  * the retention story that bounds storage growth. */
object TimeTravel {

  /** Sentinel default for `nBuckets`: resolve from the table's persisted
    * layout marker, or — at first non-empty merge — derive from the batch's
    * key count via [[Merge.autoBuckets]] (the keys/50 k rule). An explicit
    * positive count at creation pins that layout instead; on an existing
    * table it must MATCH the marker (resizing requires a rebuild), exactly
    * the [[Merge.mergeInto]] contract. Round-18: replaces the fixed 32,
    * which over-fragmented small tables (32 file writes + commits per
    * version for kilobytes) and would under-bucket 100 TB ones. */
  val AutoBuckets = 0
  private val BucketsMarker = "_graft_buckets"
  private def manifestDir(t: Path) = new Path(t, "_manifests")
  private def filesDir(t: Path, v: Int) = new Path(t, s"files/v$v")

  /** Persisted bucket count: marker if present, cross-checked against an
    * explicit request — [[Merge.resolveBuckets]] is the one shared
    * read/cross-check (round-18 ADVICE: the duplicated spelling here threw
    * a DIFFERENT exception type for the same condition).
    *
    * `tableHasData` gates the auto-size path (round-18 ADVICE): committed
    * version data WITHOUT a marker — a legacy table from before the marker
    * existed, or an externally deleted marker — must fail loudly instead of
    * silently adopting a bucket count derived from the current batch, which
    * would strand every existing key copy in old-layout buckets (exactly
    * the hazard the marker exists to prevent; [[Merge]] documents the
    * adopt-and-pin behavior for its flat tables, but a versioned table's
    * old snapshots are immutable and CANNOT be re-bucketed in place). */
  private def resolveBuckets(fs: FileSystem, t: Path, requested: Int,
      firstBatchRows: Long, tableHasData: Boolean): Int = {
    val marker = new Path(t, BucketsMarker)
    val markerExists = fs.exists(marker)
    if (!markerExists && tableHasData) throw new IllegalStateException(
      s"table at $t has committed version data but no $BucketsMarker marker; " +
        "refusing to adopt a new bucket layout over an existing table — " +
        "rebuild the table (or restore the marker) instead")
    val n = Merge.resolveBuckets(fs, marker, markerExists,
      if (requested == AutoBuckets) None else Some(requested), firstBatchRows)
    // marker BEFORE any data file — the Merge crash contract: a marker
    // without data is harmless, data without a marker could adopt a
    // different count on retry and strand stale bucket copies
    if (!markerExists) Merge.pinMarker(fs, marker, n)
    n
  }

  /** Union with ADDITIVE SCHEMA EVOLUTION (the Delta/Iceberg mergeSchema
    * semantic): version dirs written before a column existed surface it as
    * NULL, and a batch missing an old column upserts NULL there (the
    * full-row-upsert contract applied to the widened schema). Used by
    * every multi-version read so old snapshots stay readable across
    * column additions. */
  private def unionEvolved(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending (manifests are the commit log). */
  def versions(spark: SparkSession, tablePath: String): Seq[Int] = {
    val md = manifestDir(new Path(tablePath))
    val fs = fsOf(spark, md)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).map(_.getPath.getName).toSeq
      .collect { case n if n.startsWith("v") => n.drop(1).toInt }.sorted
  }

  def latestVersion(spark: SparkSession, tablePath: String): Option[Int] =
    versions(spark, tablePath).lastOption

  private def readManifest(fs: FileSystem, t: Path, v: Int): Map[Int, Int] = {
    val in = fs.open(new Path(manifestDir(t), s"v$v"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { line =>
        val Array(b, ver) = line.split(","); b.toInt -> ver.toInt
      }.toMap
    finally in.close()
  }

  private def writeManifest(fs: FileSystem, t: Path, v: Int,
      m: Map[Int, Int]): Unit = {
    val md = manifestDir(t)
    if (!fs.exists(md)) fs.mkdirs(md)
    // write-then-rename: the manifest appears atomically or not at all
    val tmp = new Path(md, s".v$v.tmp")
    val out = fs.create(tmp, true)
    try out.write(m.toSeq.sorted.map { case (b, ver) => s"$b,$ver" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // rename returns false instead of throwing on some filesystems
    // (leftover destination, object-store semantics) — an unchecked false
    // here would silently not commit the snapshot while the merge still
    // returns v, surfacing later as an inexplicable missing version
    require(fs.rename(tmp, new Path(md, s"v$v")),
      s"manifest commit failed for v$v at $t (rename returned false)")
  }

  /** Merge `updates` (≤ 1 row per key, full-row upsert — the [[Merge]]
    * contract) as a NEW snapshot; returns its version. `nBuckets`:
    * [[AutoBuckets]] resolves the persisted layout (auto-derived at first
    * non-empty merge); a positive count pins it at creation. */
  def mergeVersioned(tablePath: String, updates: DataFrame,
      keyCols: Seq[String], nBuckets: Int = AutoBuckets): Int = {
    require(keyCols.nonEmpty, "mergeVersioned needs at least one key column")
    require(!updates.columns.contains("bucket"),
      "updates must not carry a 'bucket' column (reserved for the layout)")
    val spark = updates.sparkSession
    val t = new Path(tablePath)
    val fs = fsOf(spark, t)
    val prevV = latestVersion(spark, tablePath)
    val prev = prevV.map(readManifest(fs, t, _)).getOrElse(Map.empty[Int, Int])
    val v = prevV.map(_ + 1).getOrElse(0)
    val base = updates.persist()
    try {
      val nRows = base.count()
      if (nRows == 0L) return prevV.getOrElse {
        // an empty FIRST batch still commits an empty table (version 0
        // exists, reads as zero rows) — callers can rely on a version. No
        // layout marker yet: the first NON-empty merge auto-sizes it.
        writeManifest(fs, t, v, Map.empty); v
      }
      // NULL keys never match the left_anti upsert join (SQL null
      // inequality): a NULL-key update row would be APPENDED every merge
      // while prior NULL-key rows survive — duplicates accumulating across
      // versions. Reject loudly instead (same spirit as the bucket guard) —
      // and BEFORE resolveBuckets pins a marker (round-18 ADVICE: a
      // rejected first batch must not pin a layout sized from its invalid
      // row count).
      val nNullKey = base
        .filter(keyCols.map(col(_).isNull).reduce(_ || _)).count()
      require(nNullKey == 0L,
        s"mergeVersioned: $nNullKey update rows have NULL in a key column " +
          s"(${keyCols.mkString(", ")}) — the upsert contract needs non-null keys")
      val bucketCount =
        resolveBuckets(fs, t, nBuckets, nRows, tableHasData = prev.nonEmpty)
      val keyed = base
        .withColumn("bucket", pmod(hash(keyCols.map(col): _*), lit(bucketCount)))
      val affected = keyed.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).toSet
      // current rows of the affected buckets, grouped by the version dir
      // that holds them (one read per distinct source version, not per
      // bucket)
      val sources = prev.filter { case (b, _) => affected(b) }
        .groupBy(_._2).view.mapValues(_.keys.toSeq).toSeq
      val current = sources.map { case (srcV, buckets) =>
        spark.read.parquet(filesDir(t, srcV).toString)
          .filter(col("bucket").isin(buckets: _*))
      }.reduceOption(unionEvolved)
      val merged = current match {
        case Some(cur) =>
          unionEvolved(
            cur.join(keyed.select(keyCols.map(col): _*), keyCols, "left_anti"),
            keyed)
        case None => keyed
      }
      // new version dir: inputs are OLDER versions' immutable files, so no
      // read-overwrite hazard exists and no checkpoint is needed (contrast
      // Merge.mergeInto); one file per bucket via the bucket repartition
      merged.repartition(math.max(affected.size, 1), col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(filesDir(t, v).toString)
      writeManifest(fs, t, v, prev ++ affected.map(_ -> v))
      v
    } finally base.unpersist()
  }

  /** The table exactly as of snapshot `version` (data columns only). */
  def readAt(spark: SparkSession, tablePath: String, version: Int): DataFrame = {
    val t = new Path(tablePath)
    val fs = fsOf(spark, t)
    require(fs.exists(new Path(manifestDir(t), s"v$version")),
      s"no committed snapshot v$version at $tablePath " +
        s"(have: ${versions(spark, tablePath).mkString(", ")})")
    val m = readManifest(fs, t, version)
    val parts = m.groupBy(_._2).view.mapValues(_.keys.toSeq).toSeq.map {
      case (srcV, buckets) =>
        spark.read.parquet(filesDir(t, srcV).toString)
          .filter(col("bucket").isin(buckets: _*))
    }
    parts.reduceOption(unionEvolved) match {
      case Some(df) => df.drop("bucket")
      case None => // empty table: schema unknowable from data — empty frame
        spark.emptyDataFrame
    }
  }

  /** Maintenance compaction (the OPTIMIZE analog for the versioned table):
    * rewrite the CURRENT state of every bucket into one fresh version dir
    * (one file per bucket) and commit it as a new snapshot whose manifest
    * points only at itself. Contents are bit-identical to the latest
    * snapshot — this is a layout operation. After a long merge history the
    * current state is scattered across many version dirs (each read fans
    * out across them); compaction collapses the read back to one dir and
    * makes every older version dir vacuum-eligible the moment retention
    * passes it. Returns the new version. */
  def compactLatest(spark: SparkSession, tablePath: String): Int = {
    val t = new Path(tablePath)
    val fs = fsOf(spark, t)
    val prevV = latestVersion(spark, tablePath).getOrElse(
      throw new IllegalArgumentException(s"no committed table at $tablePath"))
    val m = readManifest(fs, t, prevV)
    val v = prevV + 1
    if (m.nonEmpty) {
      val current = m.groupBy(_._2).view.mapValues(_.keys.toSeq).toSeq.map {
        case (srcV, buckets) =>
          spark.read.parquet(filesDir(t, srcV).toString)
            .filter(col("bucket").isin(buckets: _*))
      }.reduce(unionEvolved)
      current.repartition(math.max(m.size, 1), col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(filesDir(t, v).toString)
    }
    writeManifest(fs, t, v, m.keys.map(_ -> v).toMap)
    v
  }

  /** Roll the table back to snapshot `toV` AS A NEW VERSION (the Delta
    * RESTORE semantic): commits a manifest IDENTICAL to `toV`'s under the
    * next version number — pure metadata, zero data movement. History is
    * preserved: the rolled-back versions stay readable (and diffable via
    * [[changesBetween]]) until retention vacuums them, and the restored
    * version's files are carried forward by reference, so [[vacuum]] keeps
    * them alive as long as any retained manifest points at them. */
  def restoreVersion(spark: SparkSession, tablePath: String, toV: Int): Int = {
    val t = new Path(tablePath)
    val fs = fsOf(spark, t)
    require(fs.exists(new Path(manifestDir(t), s"v$toV")),
      s"no committed snapshot v$toV at $tablePath " +
        s"(have: ${versions(spark, tablePath).mkString(", ")})")
    val v = latestVersion(spark, tablePath).get + 1
    writeManifest(fs, t, v, readManifest(fs, t, toV))
    v
  }

  /** Change feed between two snapshots: every key INSERTED, UPDATED (any
    * non-key column differs), or DELETED going from `fromV` to `toV` —
    * the incremental-consumption contract (a downstream job that processed
    * snapshot `fromV` calls this instead of re-reading the table; work
    * scales with the CHANGE, which is the point of keeping snapshots).
    *
    * Shape at scale: a full-outer equi-join of the two snapshot reads on
    * the key. The join could be narrowed to buckets whose manifest POINTER
    * changed between the versions (an untouched bucket cannot differ) —
    * a driver-side manifest diff prunes the read set before any scan; this
    * implementation applies that pruning, so the join runs only over the
    * changed buckets' files. Change typing compares the full row via a
    * null-safe struct equality. */
  def changesBetween(spark: SparkSession, tablePath: String,
      fromV: Int, toV: Int, keyCols: Seq[String]): DataFrame = {
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV")
    val t = new Path(tablePath)
    val fs = fsOf(spark, t)
    val mFrom = readManifest(fs, t, fromV)
    val mTo = readManifest(fs, t, toV)
    // manifest diff: only buckets whose pointer moved can hold changes
    val changed = (mFrom.keySet ++ mTo.keySet)
      .filter(b => mFrom.get(b) != mTo.get(b))
    def sliceAt(m: Map[Int, Int]): Option[DataFrame] =
      m.filter { case (b, _) => changed(b) }
        .groupBy(_._2).view.mapValues(_.keys.toSeq).toSeq.map {
          case (srcV, buckets) =>
            spark.read.parquet(filesDir(t, srcV).toString)
              .filter(col("bucket").isin(buckets: _*))
        }.reduceOption(unionEvolved).map(_.drop("bucket"))
    (sliceAt(mFrom), sliceAt(mTo)) match {
      case (None, None) =>
        spark.emptyDataFrame
      case (before, after) =>
        val b0 = before.getOrElse(after.get.filter(lit(false)))
        val a0 = after.getOrElse(before.get.filter(lit(false)))
        // align both slices to the union schema (additive evolution: a
        // column born after `fromV` reads as NULL on the before side and
        // diffs as an update wherever the after side holds a value)
        def pad(d: DataFrame, like: DataFrame): DataFrame =
          like.columns.foldLeft(d)((acc, c) =>
            if (acc.columns.contains(c)) acc
            else acc.withColumn(c, lit(null).cast(like.schema(c).dataType)))
        val b = pad(b0, a0)
        val a = pad(a0, b0)
        val dataCols = a.columns.filterNot(keyCols.contains).toSeq
        val bKeyed = b.select(
          org.apache.spark.sql.functions.struct(keyCols.map(col): _*).as("k"),
          org.apache.spark.sql.functions.struct(dataCols.map(col): _*).as("before"))
        val aKeyed = a.select(
          org.apache.spark.sql.functions.struct(keyCols.map(col): _*).as("k"),
          org.apache.spark.sql.functions.struct(dataCols.map(col): _*).as("after"))
        bKeyed.join(aKeyed, Seq("k"), "full_outer")
          .select(col("k.*"),
            org.apache.spark.sql.functions
              .when(col("before").isNull, lit("insert"))
              .when(col("after").isNull, lit("delete"))
              .otherwise(lit("update")).as("change"),
            col("before"), col("after"))
          .filter(col("before").isNull || col("after").isNull ||
            !(col("before") <=> col("after")))
    }
  }

  /** Drop every version directory not referenced by one of the newest
    * `keepLast` manifests, and the older manifests themselves. Returns the
    * dropped version ids. Old SNAPSHOTS become unreadable; the LATEST
    * state is untouched (its files are carried forward by reference and
    * therefore always retained). */
  def vacuum(spark: SparkSession, tablePath: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "must retain at least the latest snapshot")
    val t = new Path(tablePath)
    val fs = fsOf(spark, t)
    val vs = versions(spark, tablePath)
    // no early return when vs.size <= keepLast: even with every manifest
    // retained, a de-referenced carried-forward dir (manifest vacuumed
    // earlier, files since de-referenced by a compaction) must still be
    // reclaimed from the disk listing (round-8 self-review)
    val keep = vs.takeRight(keepLast).toSet
    val referenced = keep.toSeq.flatMap(readManifest(fs, t, _).values).toSet
    // enumerate files/v* ON DISK, not just versions with a surviving
    // manifest: a dir whose manifest an earlier vacuum dropped while its
    // files stayed carried-forward-referenced must be re-examined once a
    // later compaction de-references it — deriving droppability from
    // versions() alone leaked such dirs forever (round-7 advice, medium)
    val fd = new Path(t, "files")
    val onDisk =
      if (!fs.exists(fd)) Seq.empty[Int]
      else fs.listStatus(fd).map(_.getPath.getName).toSeq
        .collect { case n if n.startsWith("v") => n.drop(1).toInt }.sorted
    // never touch dirs ABOVE the newest committed manifest: files land
    // before the manifest (the crash contract), so a dir numbered past
    // maxV is either an in-flight merge or a crash orphan the retry will
    // overwrite — deleting it here would race a committing writer
    // (round-8 self-review). Historical garbage is always ≤ maxV.
    val maxV = vs.lastOption.getOrElse(-1)
    val droppableDirs =
      onDisk.filter(v => v <= maxV && !keep(v) && !referenced(v))
    droppableDirs.foreach(v => fs.delete(filesDir(t, v), true))
    // every non-retained manifest goes (its snapshot stops being readable),
    // whether or not its files survive as carried-forward references
    val droppedManifests = vs.filterNot(keep)
    droppedManifests.foreach(v =>
      fs.delete(new Path(manifestDir(t), s"v$v"), false))
    (droppableDirs ++ droppedManifests).distinct.sorted
  }
}
