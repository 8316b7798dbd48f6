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
}
