package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef

/** Oracle-gated exercise of the generic batch MERGE INTO
  * ([[Merge.mergeInto]]) — the table-maintenance primitive the streaming
  * changelog sink delegates to. Until this key existed, mergeInto was only
  * driven through that sink, so a regression in the batch-merge path proper
  * (create-then-merge, affected-bucket rewrite, marker pinning) could hide
  * behind the streaming machinery (round-5 verdict item).
  *
  * The scenario is a deterministic three-batch upsert sequence over the
  * `events` table: batch b (b = 0, 1, 2 in order) carries one row per user
  * summarizing that user's events with `event_id % 3 = b` (their max event
  * id and count). Upsert semantics are full-row replace, so after the
  * sequence the table holds, for every user, exactly the summary row of the
  * LAST batch that contained them — which the DuckDB oracle recomputes
  * directly as a grouped join on `max(batch)` per user. Batch 0 exercises
  * table creation + layout-marker pinning; batches 1 and 2 exercise the
  * affected-bucket copy-on-write merge against committed data. */
object TableRegistry {

  /** Number of upsert batches in the merge exercise (shared with the oracle
    * via interpolation). */
  val MergeBatches = 3

  def mergeIntoDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.TempDirs.scratch("graft_merge_into").toString + "/table"
    val e = Tables(spark, dir).events
      .select(col("user_id").as("uid"), col("event_id"))
      .filter(col("uid").isNotNull && col("event_id").isNotNull)
    for (b <- 0 until MergeBatches) {
      val batch = e.filter(pmod(col("event_id"), lit(MergeBatches)) === b)
        .groupBy(col("uid"))
        .agg(max(col("event_id")).as("v_last"), count(lit(1)).as("n_b"))
      Merge.mergeInto(table, batch, keyCols = Seq("uid"))
    }
    spark.read.parquet(table)
      .select(col("uid"), col("v_last"), col("n_b"))
      .orderBy(col("uid"))
  }

  /** Time-travel exercise over the SAME three-batch upsert sequence as
    * [[mergeIntoDemo]], but through [[TimeTravel.mergeVersioned]]: after
    * the sequence, EVERY intermediate state is still readable — the output
    * is the union of `readAt(v)` for v = 0, 1, 2, each tagged with its
    * version. The oracle recomputes snapshot v directly as the
    * last-write-wins state over batches 0..v, so green means
    * snapshot-isolation reads reconstruct history exactly. A vacuum
    * retention pass and crash/orphan behavior are spec-checked
    * (TimeTravelSpec); this key gates the read-path semantics. */
  def timeTravelDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = sharedVersionedTable(spark, dir)
    (0 until MergeBatches).map(v => TimeTravel.readAt(spark, table, v)
        .select(lit(v.toLong).as("version"), col("uid"), col("v_last"), col("n_b")))
      .reduce(_ unionByName _)
      .orderBy(col("version"), col("uid"))
  }

  /** Change-data-feed exercise: the same versioned three-batch sequence,
    * then [[TimeTravel.changesBetween]](v0 → v2) — the incremental-
    * consumption contract (a downstream that processed snapshot 0 asks
    * "what changed since", and pays for the CHANGES, not the table: the
    * manifest diff prunes untouched buckets before any scan). Structs are
    * flattened to scalar before/after columns for the hash gate. Upsert
    * history produces inserts (users absent from batch 0) and updates
    * (summary replaced by a later batch); unchanged keys must NOT appear. */
  def tableCdcDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = sharedVersionedTable(spark, dir)
    TimeTravel.changesBetween(spark, table, 0, MergeBatches - 1, Seq("uid"))
      .select(col("uid"), col("change"),
        col("before.v_last").as("before_v_last"),
        col("before.n_b").as("before_n_b"),
        col("after.v_last").as("after_v_last"),
        col("after.n_b").as("after_n_b"))
      .orderBy(col("uid"))
  }

  private val versionedTables =
    scala.collection.concurrent.TrieMap[String, String]()

  /** The committed three-batch versioned table, built ONCE per
    * (process, dir): `q_time_travel`, `q_table_cdc`, and `q_table_restore`
    * replay the IDENTICAL merge sequence, so a sweep otherwise pays the
    * three merges (writes + manifests) three times — the [[graft.ops.Staged]]
    * amortization applied to a table directory instead of a DataFrame.
    * Safe to share because reads are snapshot-isolated against immutable
    * manifests: the restore key APPENDS versions (v3, v4) and never
    * disturbs v0–v2, which are the only versions the other two read.
    * (`q_schema_evolution` keeps its own table — its version line carries
    * deliberately different schemas.) */
  private def sharedVersionedTable(spark: SparkSession, dir: String): String =
    versionedTables.getOrElseUpdate(new java.io.File(dir).getCanonicalPath, {
      val table = graft.TempDirs.scratch("graft_versioned").toString + "/table"
      for (b <- 0 until MergeBatches)
        TimeTravel.mergeVersioned(table, userBatch(spark, dir, b),
          keyCols = Seq("uid"))
      table
    })

  /** Per-batch user summary over events with `event_id % MergeBatches = b`
    * — the shared building block of every versioned-table exercise. */
  private def userBatch(spark: SparkSession, dir: String, b: Int): DataFrame =
    Tables(spark, dir).events
      .select(col("user_id").as("uid"), col("event_id"))
      .filter(col("uid").isNotNull && col("event_id").isNotNull)
      .filter(pmod(col("event_id"), lit(MergeBatches)) === b)
      .groupBy(col("uid"))
      .agg(max(col("event_id")).as("v_last"), count(lit(1)).as("n_b"))

  /** Additive schema evolution across snapshots (the Delta/Iceberg
    * mergeSchema semantic driven through [[TimeTravel]]): batch 0 commits
    * a NARROW schema (uid, v_last); batch 1 ADDS `n_b`; batch 2 arrives
    * WITHOUT `v_last`. Every snapshot stays readable on the union schema —
    * rows written before a column existed read NULL there, and the
    * full-row-upsert contract means a narrow late batch nulls the columns
    * it omits for the keys it touches. The oracle recomputes each
    * version's last-write-wins state and nulls exactly the columns the
    * winning batch lacked — green means old files + new schema compose
    * exactly, with zero rewrites of committed data. */
  def schemaEvolutionDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.TempDirs.scratch("graft_schema_evo").toString + "/table"
    TimeTravel.mergeVersioned(table,
      userBatch(spark, dir, 0).drop("n_b"), keyCols = Seq("uid"))
    TimeTravel.mergeVersioned(table,
      userBatch(spark, dir, 1), keyCols = Seq("uid"))
    TimeTravel.mergeVersioned(table,
      userBatch(spark, dir, 2).drop("v_last"), keyCols = Seq("uid"))
    (0 until MergeBatches).map { v =>
      val r = TimeTravel.readAt(spark, table, v)
      val padded = Seq("v_last", "n_b").foldLeft(r)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("long")))
      padded.select(lit(v.toLong).as("version"), col("uid"),
        col("v_last"), col("n_b"))
    }.reduce(_ unionByName _)
      .orderBy(col("version"), col("uid"))
  }

  /** Snapshot ROLLBACK (the Delta RESTORE semantic): after the three-batch
    * sequence, [[TimeTravel.restoreVersion]] rolls the table back to v0 as
    * a new version v3 — pure manifest metadata, zero data movement (the
    * spec asserts no files/v3 dir exists) — and the upsert line continues
    * from the restored state: merging batch 1 on top yields exactly the
    * last-write-wins state over batches {0, 1}, as if batch 2 had never
    * happened. The output reads BOTH the restored snapshot and the
    * continued line, so green pins restore + post-restore writes. */
  private val restoredVersions =
    scala.collection.concurrent.TrieMap[String, (Int, Int)]()

  def tableRestoreDemo(spark: SparkSession, dir: String): DataFrame = {
    val table = sharedVersionedTable(spark, dir)
    // idempotent per process: the restore+merge sequence mutates the shared
    // table, so a second construction must reuse the first run's versions
    // rather than appending a new pair (round-8 self-review); the OUTPUT
    // version labels are the logical constants the oracle states, not the
    // physical version numbers
    val (v3, v4) = restoredVersions.getOrElseUpdate(table, {
      val r = TimeTravel.restoreVersion(spark, table, 0)
      val m = TimeTravel.mergeVersioned(table, userBatch(spark, dir, 1),
        keyCols = Seq("uid"))
      (r, m)
    })
    Seq(v3 -> MergeBatches, v4 -> (MergeBatches + 1)).map { case (v, label) =>
      TimeTravel.readAt(spark, table, v)
        .select(lit(label.toLong).as("version"), col("uid"),
          col("v_last"), col("n_b"))
    }.reduce(_ unionByName _)
      .orderBy(col("version"), col("uid"))
  }

  /** Number of delta batches in the incremental-view exercise. */
  val MvBatches = 3

  /** Incremental materialized-view maintenance: a per-customer order
    * summary (count + exact revenue) kept up to date across [[MvBatches]]
    * delta loads WITHOUT ever recomputing the full aggregate — each batch
    * partial-aggregates ONLY its delta, joins the handful of affected keys
    * against the current view to add the increments, and merges the summed
    * rows back via [[Merge.mergeInto]] (untouched keys survive through the
    * merge's left-anti, never rewritten beyond their bucket's
    * copy-on-write). The oracle recomputes the same summary from scratch
    * over all orders — green means increment-and-merge ≡ full recompute.
    *
    * This is the view-maintenance shape a 100 TB warehouse needs: per-load
    * cost scales with the DELTA (partial agg + affected-key join + affected-
    * bucket rewrite), not the accumulated table. Count and revenue deltas
    * commute (count sums; revenue is an exact decimal sum), so batch
    * boundaries can fall anywhere. */
  def mvIncrementalDemo(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out
    val table = graft.TempDirs.scratch("graft_mv_inc").toString + "/mv"
    val o = Tables(spark, dir).orders
      .select(col("o_custkey").as("cust"), col("o_orderkey"),
        col("o_totalprice"))
      .filter(col("cust").isNotNull && col("o_orderkey").isNotNull)
    for (b <- 0 until MvBatches) {
      val delta = o.filter(pmod(col("o_orderkey"), lit(MvBatches)) === b)
        .groupBy(col("cust"))
        .agg(count(lit(1)).as("dn"),
          sum(col("o_totalprice").cast(Out.SumDecimal)).as("ds"))
      val updates =
        if (b == 0)
          delta.select(col("cust"), col("dn").as("n_orders"),
            col("ds").as("rev_dec"))
        else
          delta.join(
              spark.read.parquet(table)
                .select(col("cust"), col("n_orders"), col("rev_dec")),
              Seq("cust"), "left")
            .select(col("cust"),
              (col("dn") + coalesce(col("n_orders"), lit(0L))).as("n_orders"),
              (col("ds") + coalesce(col("rev_dec"),
                lit(0).cast(Out.SumDecimal))).as("rev_dec"))
      Merge.mergeInto(table, updates, keyCols = Seq("cust"))
    }
    spark.read.parquet(table)
      .select(col("cust"), col("n_orders"),
        col("rev_dec").cast("double").as("revenue"))
      .orderBy(col("cust"))
  }

  /** Per-row byte estimate and target output size for the compaction
    * planner (shared with the oracle via interpolation). The 1 MiB target
    * is testdata-scaled; production uses 128–1024 MiB with the same plan. */
  val CompactRowBytes = 64L
  val CompactTargetBytes = 1L << 20

  /** Small-file compaction PLANNER: given per-file stats (simulated here as
    * one "file" per lineitem ship-day — count × [[CompactRowBytes]]), assign
    * day-ordered files to merge bins of ≈ [[CompactTargetBytes]] and report
    * each bin's file count, byte total, and day range — the plan a
    * [[Layout.compact]]-style executor consumes. Binning is by EXCLUSIVE
    * prefix sum (`bin = ⌊cum_before / target⌋`): every file lands in the bin
    * where its bytes start, which equals sequential greedy packing whenever
    * files are small against the target (the compaction regime by
    * definition) and — unlike the sequential recurrence — needs only a
    * prefix sum, so the same two-pass distributed prefix-sum machinery as
    * token packing applies if file stats ever outgrow one task. File stats
    * are METADATA (one row per file): the single-partition window here is
    * the honest shape, same as a real table service planning from its
    * manifest. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Out
    val files = Tables(spark, dir).lineitem
      .groupBy((Out.epochSec(col("l_shipdate")) / 86400).cast("long").as("day"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bytes", col("n_rows") * CompactRowBytes)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum0", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum0") / CompactTargetBytes))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
        min(col("day")).as("day_lo"), max(col("day")).as("day_hi"))
      .orderBy(col("bin"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_compaction_plan",
      s"""WITH f AS (
         |  SELECT (${graft.ops.Out.sql.epochSec("l_shipdate")} // 86400) AS day,
         |    count(*) * $CompactRowBytes AS bytes
         |  FROM lineitem GROUP BY 1),
         |c AS (
         |  SELECT day, bytes,
         |    COALESCE(CAST(SUM(bytes) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cum0
         |  FROM f)
         |SELECT cum0 // $CompactTargetBytes AS bin, count(*) AS n_files,
         |  CAST(sum(bytes) AS BIGINT) AS bin_bytes,
         |  min(day) AS day_lo, max(day) AS day_hi
         |FROM c GROUP BY 1 ORDER BY bin""".stripMargin)(compactionPlan),

    QueryDef("q_mv_incremental",
      s"""SELECT o_custkey AS cust, count(*) AS n_orders,
         |  ${graft.ops.Out.sql.dsum("o_totalprice")} AS revenue
         |FROM orders
         |WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin)(mvIncrementalDemo),

    QueryDef("q_merge_into",
      s"""WITH e AS (
         |  SELECT user_id AS uid, event_id, event_id % $MergeBatches AS b
         |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
         |m AS (SELECT uid, max(b) AS bmax FROM e GROUP BY 1)
         |SELECT e.uid, max(e.event_id) AS v_last, count(*) AS n_b
         |FROM e JOIN m ON e.uid = m.uid AND e.b = m.bmax
         |GROUP BY e.uid ORDER BY e.uid""".stripMargin)(mergeIntoDemo),

    // Snapshot v = last-write-wins over batches 0..v; one arm per version.
    QueryDef("q_time_travel", {
      def arm(v: Int) =
        s"""SELECT CAST($v AS BIGINT) AS version, e.uid,
           |  max(e.event_id) AS v_last, count(*) AS n_b
           |FROM e JOIN (SELECT uid, max(b) AS bmax FROM e
           |             WHERE b <= $v GROUP BY 1) m
           |  ON e.uid = m.uid AND e.b = m.bmax
           |GROUP BY e.uid""".stripMargin
      s"""WITH e AS (
         |  SELECT user_id AS uid, event_id, event_id % $MergeBatches AS b
         |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL)
         |${(0 until MergeBatches).map(arm).mkString("\nUNION ALL\n")}
         |ORDER BY version, uid""".stripMargin
    })(timeTravelDemo),

    // Snapshot v = last-write-wins over batches 0..v on the UNION schema;
    // the winning batch's missing columns read NULL (additive evolution).
    QueryDef("q_schema_evolution", {
      def arm(v: Int) =
        s"""SELECT CAST($v AS BIGINT) AS version, a.uid,
           |  CASE WHEN a.b = ${MergeBatches - 1} THEN NULL ELSE a.v_last END AS v_last,
           |  CASE WHEN a.b = 0 THEN NULL ELSE a.n_b END AS n_b
           |FROM a JOIN (SELECT uid, max(b) AS bmax FROM a
           |             WHERE b <= $v GROUP BY 1) m
           |  ON a.uid = m.uid AND a.b = m.bmax""".stripMargin
      s"""WITH e AS (
         |  SELECT user_id AS uid, event_id, event_id % $MergeBatches AS b
         |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
         |a AS (SELECT uid, b, max(event_id) AS v_last, count(*) AS n_b
         |      FROM e GROUP BY 1, 2)
         |${(0 until MergeBatches).map(arm).mkString("\nUNION ALL\n")}
         |ORDER BY version, uid""".stripMargin
    })(schemaEvolutionDemo),

    // Restored snapshot v3 = batch-0 state verbatim; continued line v4 =
    // last-write-wins over batches {0, 1} (batch 2 rolled away).
    QueryDef("q_table_restore",
      s"""WITH e AS (
         |  SELECT user_id AS uid, event_id, event_id % $MergeBatches AS b
         |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
         |a AS (SELECT uid, b, max(event_id) AS v_last, count(*) AS n_b
         |      FROM e GROUP BY 1, 2)
         |SELECT CAST($MergeBatches AS BIGINT) AS version, uid, v_last, n_b
         |FROM a WHERE b = 0
         |UNION ALL
         |SELECT CAST(${MergeBatches + 1} AS BIGINT) AS version, a.uid,
         |  a.v_last, a.n_b
         |FROM a JOIN (SELECT uid, max(b) AS bmax FROM a
         |             WHERE b <= 1 GROUP BY 1) m
         |  ON a.uid = m.uid AND a.b = m.bmax
         |ORDER BY version, uid""".stripMargin)(tableRestoreDemo),

    // Change feed v0 → v2 = full-outer diff of the two last-write-wins
    // states; unchanged rows filtered on the full summary.
    QueryDef("q_table_cdc", {
      def state(v: Int) =
        s"""SELECT e.uid, max(e.event_id) AS v_last, count(*) AS n_b
           |FROM e JOIN (SELECT uid, max(b) AS bmax FROM e
           |             WHERE b <= $v GROUP BY 1) m
           |  ON e.uid = m.uid AND e.b = m.bmax
           |GROUP BY e.uid""".stripMargin
      s"""WITH e AS (
         |  SELECT user_id AS uid, event_id, event_id % $MergeBatches AS b
         |  FROM events WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
         |s0 AS (${state(0)}),
         |s2 AS (${state(MergeBatches - 1)})
         |SELECT COALESCE(s0.uid, s2.uid) AS uid,
         |  CASE WHEN s0.uid IS NULL THEN 'insert'
         |       WHEN s2.uid IS NULL THEN 'delete'
         |       ELSE 'update' END AS change,
         |  s0.v_last AS before_v_last, s0.n_b AS before_n_b,
         |  s2.v_last AS after_v_last, s2.n_b AS after_n_b
         |FROM s0 FULL OUTER JOIN s2 ON s0.uid = s2.uid
         |WHERE s0.uid IS NULL OR s2.uid IS NULL
         |   OR s0.v_last <> s2.v_last OR s0.n_b <> s2.n_b
         |ORDER BY uid""".stripMargin
    })(tableCdcDemo))
}
