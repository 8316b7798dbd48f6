package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-layout helpers — the write-side half of the 100 TB story.
  *
  * Query speed at scale is decided as much by how the data was WRITTEN as by
  * the plan that reads it: parquet keeps per-row-group min/max statistics for
  * every column, and a scan can skip a row group whose [min, max] interval
  * misses the predicate — but only if the writer clustered the data so those
  * intervals are narrow. A shuffled write interleaves the whole value range
  * into every file and the stats prune nothing.
  */
object Layout {

  /** Range-clustered parquet write: globally range-partition the rows on
    * `key` into `nFiles` contiguous slices, sort each slice, and write one
    * file per slice. The resulting files' min/max footer stats on `key` are
    * pairwise non-overlapping (asserted in LayoutSpec), so any range
    * predicate on `key` prunes to the few files it intersects — the poor
    * man's clustered index, and the standard layout for time-partitioned
    * fact data.
    *
    * At scale: `repartitionByRange` samples the key distribution to pick
    * balanced boundaries (skew-resistant, one pass), and the per-partition
    * sort keeps row-group stats tight WITHIN each file too. The write is one
    * shuffle — the same cost any repartitioning write pays. */
  def writeClustered(df: DataFrame, path: String, key: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory into ~`targetFileBytes` output files,
    * preserving content — the maintenance pass every incrementally-written
    * table needs (micro-batch sinks and per-task writers accrete small
    * files; each file costs a task + a footer read + an object-store
    * request, so a 100 TB table of 1 MB files is unqueryable long before
    * it is unreadable).
    *
    * File count is sized from the directory's ACTUAL bytes (driver-side
    * metadata listing, no data read); pass `sortKey` to restore clustering
    * while compacting ([[writeClustered]] semantics) — compaction is the
    * natural moment to re-sort. Writes to `outPath` (immutable output, the
    * caller swaps paths or table pointers atomically; in-place rename is a
    * table-format job, not a bare-parquet one). Returns the file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long = 128L << 20,
      sortKey: Option[String] = None): Int = {
    // Read inPath ourselves: sizing from one path while writing a
    // caller-supplied frame of different data would silently mis-size the
    // output files (review finding) — the df is derivable, not a parameter.
    val df = spark.read.parquet(inPath)
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    sortKey match {
      case Some(k) => writeClustered(df, outPath, k, nFiles)
      case None => df.repartition(nFiles).write.mode("overwrite").parquet(outPath)
    }
    nFiles
  }
}
