package graft

import org.apache.spark.sql.functions._
import graft.tables.{Layout, Tables}

/** The clustered-write contract: range-partitioned files carry disjoint
  * min/max key intervals — the precondition for parquet row-group/file
  * pruning on range predicates at scale. */
class LayoutSpec extends SparkSpec {

  test("range-clustered write yields non-overlapping per-file key intervals") {
    val path = sys.props("java.io.tmpdir") + "/graft_clustered_lineitem"
    val n = 8
    Layout.writeClustered(
      Tables(spark, sf).lineitem.select("l_orderkey", "l_shipdate", "l_quantity"),
      path, "l_shipdate", n)

    val back = spark.read.parquet(path)
    back.count() shouldBe Tables(spark, sf).lineitem.count()

    // one file per range slice
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col("l_shipdate")).as("lo"), max(col("l_shipdate")).as("hi"),
        count(lit(1)).as("rows"))
      .collect()
    perFile.length shouldBe n

    // sorted by their minimum, the intervals must not interleave: every
    // file's range starts at or after the previous file's range ends —
    // exactly what lets a range predicate skip whole files via footer stats
    val iv = perFile
      .map(r => (r.getAs[java.time.LocalDateTime](1), r.getAs[java.time.LocalDateTime](2)))
      .sortBy(_._1)(Ordering.fromLessThan(_.isBefore(_)))
    iv.sliding(2).foreach {
      case Array((_, hiPrev), (loNext, _)) =>
        assert(!hiPrev.isAfter(loNext),
          s"overlapping clustered ranges: $hiPrev > $loNext")
      case _ =>
    }
    // range sampling must not have collapsed everything into one slice
    assert(perFile.map(_.getLong(3)).max < back.count(),
      "clustering produced a single non-empty slice")
  }
}
