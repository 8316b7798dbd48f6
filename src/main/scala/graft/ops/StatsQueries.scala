package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Statistical / analytical operators over the TPC-H-ish batch tables —
  * exact percentiles, histograms, correlation, pivot, weighted aggregates,
  * deterministic sampling, and a binned range join.
  *
  * Determinism rules (SURVEY.md §7.6) applied throughout:
  *
  *   - **Never sum raw doubles across partitions.** Partial-aggregation order
  *     differs between engines (and between runs), so any oracle-checked sum
  *     goes through DECIMAL: the testdata's numeric columns are clean 2/4-dp
  *     decimals stored as doubles (verified: max |x·100 − round(x·100)| ≈
  *     1e-9), so `CAST(x AS DECIMAL(18,2))` lands on the same exact decimal in
  *     both engines and decimal sums are order-independent integers.
  *   - **Derived moments in double, from exact inputs.** corr/stddev are
  *     computed from the exact decimal sums with an explicit double formula —
  *     identical expression tree in both engines → bit-identical result —
  *     rather than the engines' streaming `corr()`/`stddev()` implementations,
  *     whose merge order is nondeterministic.
  *   - **Exact percentiles** (`percentile` ≡ DuckDB `quantile_cont`): both
  *     engines sort and linearly interpolate `lower + frac·(upper − lower)`.
  */
object StatsQueries {

  /** Exact quartiles of extended price per return flag. At 100 TB exact
    * percentile is a sort-based aggregate per group; the grouped form keeps
    * the sort partition-local per key (vs a global median, which would need
    * `approx_percentile` — provided separately as q_approx_distinct-style
    * non-oracle ops). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"))
      .orderBy(col("l_returnflag"))

  /** Fixed-width histogram of extended price (5000-wide buckets): the
    * classic distributed histogram — one narrow projection, one shuffle on
    * the bucket id, count/min/max are order-independent. */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .select((floor(col("l_extendedprice") / 5000)).cast("long").as("bucket"),
        col("l_extendedprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy(col("bucket"))

  /** Pearson correlation + sample stddev of (quantity, extendedprice) per
    * return flag, decomposed into exact decimal power sums (map-side partial
    * agg, one tiny shuffle) with the moment formulas evaluated in double —
    * the scalable AND deterministic spelling of `corr()`/`stddev_samp()`. */
  def corrStats(spark: SparkSession, dir: String): DataFrame = {
    val q = expr("cast(l_quantity as decimal(18,2))")
    val p = expr("cast(l_extendedprice as decimal(18,2))")
    Tables(spark, dir).lineitem
      .select(col("l_returnflag"), q.as("q"), p.as("p"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("q")).cast("double").as("sq"),
        sum(col("p")).cast("double").as("sp"),
        sum(col("q") * col("q")).cast("double").as("sqq"),
        sum(col("p") * col("p")).cast("double").as("spp"),
        sum(col("q") * col("p")).cast("double").as("sqp"))
      .select(
        col("l_returnflag"),
        col("n").cast("long").as("n"),
        // Degenerate groups guarded EXPLICITLY (single row, zero variance):
        // without the CASE, Spark's non-ANSI 0/0 yields NULL while DuckDB
        // yields NaN/Inf — an engine divergence a one-row category on
        // realistic data would expose. NULL is the defined answer: the
        // statistic does not exist for these groups.
        when(col("n") > 1 &&
            (col("n") * col("sqq") - col("sq") * col("sq")) > 0 &&
            (col("n") * col("spp") - col("sp") * col("sp")) > 0,
          round((col("n") * col("sqp") - col("sq") * col("sp")) /
            (sqrt(col("n") * col("sqq") - col("sq") * col("sq")) *
              sqrt(col("n") * col("spp") - col("sp") * col("sp"))), 6))
          .as("corr_qp"),
        // greatest(..., 0): a zero-variance group's numerator can land a
        // few ulps NEGATIVE after the decimal→double casts — sqrt(negative)
        // is NaN in Spark but an error in DuckDB, the same divergence class
        // clamped in TimeseriesQueries.anomalyZscore. Clamped in the oracle
        // too (GREATEST), so both engines report exactly 0.
        when(col("n") > 1,
          round(sqrt(greatest(
            col("n") * col("sqq") - col("sq") * col("sq"), lit(0.0)) /
            (col("n") * (col("n") - 1))), 6)).as("stddev_q"))
      .orderBy(col("l_returnflag"))
  }

  /** Pivot: line counts by return flag × line status, statuses as columns —
    * Spark's `pivot` with explicit values (no extra pass to discover them;
    * at scale the value list is a catalog fact, not a runtime discovery). */
  def pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      // Spark pivot yields NULL for an empty cell where DuckDB's
      // `count(*) FILTER` yields 0 — normalize to the SQL semantics.
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"))
      .orderBy(col("l_returnflag"))

  /** Revenue-weighted average discount per return flag: exact decimal
    * sum-of-products / sum, single shuffle, division in double at the end. */
  def weightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val p = expr("cast(l_extendedprice as decimal(18,2))")
    val d = expr("cast(l_discount as decimal(18,2))")
    Tables(spark, dir).lineitem
      .select(col("l_returnflag"), p.as("p"), d.as("d"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("p") * col("d")).cast("double").as("wsum"),
        sum(col("p")).cast("double").as("psum"))
      .select(col("l_returnflag"), col("n"),
        round(col("wsum") / col("psum"), 6).as("wavg_discount"))
      .orderBy(col("l_returnflag"))
  }

  /** Deterministic 5% hash sample of orders: MD5(key) mod 20 — reproducible
    * across engines, runs, and cluster sizes (unlike `TABLESAMPLE`/`rand()`),
    * and pushed into the scan as a cheap per-row predicate. The standard way
    * to cut a stable dev slice from a 100 TB table. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(expr(
        s"${TextQueries.hash48("cast(o_orderkey as string)")} % 20 = 0"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  /** Representativeness audit of the deterministic 5% hash sample
    * ([[sampleHash]]'s predicate): per order status, the full-corpus share
    * next to the in-sample share and the delta. A hash of the PRIMARY KEY
    * is provably independent of every attribute, so deltas here are pure
    * sampling noise — the audit quantifies it, and catches the day someone
    * "optimizes" the sample to hash a correlated column instead (the
    * classic silent bias). One pass: the sample membership is a codegen'd
    * flag riding the same conditional partial-agg as the full counts. */
  def sampleBias(spark: SparkSession, dir: String): DataFrame = {
    val inSample =
      expr(s"${TextQueries.hash48("cast(o_orderkey as string)")} % 20 = 0")
    val grid = Tables(spark, dir).orders
      .where(col("o_orderstatus").isNotNull)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_full"),
        sum(when(inSample, 1L).otherwise(0L)).as("n_sample"))
    val tot = grid.agg(sum(col("n_full")).as("t_full"),
      sum(col("n_sample")).as("t_sample"))
    grid.crossJoin(broadcast(tot))
      .select(col("o_orderstatus"), col("n_full"), col("n_sample"),
        round(col("n_full").cast("double") / col("t_full").cast("double"), 6)
          .as("full_share"),
        round(col("n_sample").cast("double") / col("t_sample").cast("double"), 6)
          .as("sample_share"),
        round(col("n_sample").cast("double") / col("t_sample").cast("double")
          - col("n_full").cast("double") / col("t_full").cast("double"), 6)
          .as("share_delta"))
      .orderBy(col("o_orderstatus"))
  }

  /** Binned range self-join: pairs of events by the same user within 60 s,
    * counted per user. The scalable spelling of the θ-join
    * `|ts_a − ts_b| ≤ 60 s`: bucket time into 60-s bins, equi-join on
    * (user, bin) with each left row exploded to its 3 candidate bins, then
    * verify the exact predicate. Every true pair matches on exactly one bin
    * (the right row's own), so no dedup pass is needed, and the shuffle key
    * (user, bin) bounds every join group — a plain θ-join would be a
    * broadcast-nested-loop at any scale. */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("bin", expr("us div 60000000"))
    val a = e.select(col("user_id"), col("event_id").as("id_a"), col("us").as("us_a"),
      explode(expr("array(bin - 1, bin, bin + 1)")).as("bin"))
    val b = e.select(col("user_id"), col("event_id").as("id_b"), col("us").as("us_b"), col("bin"))
    a.join(b, Seq("user_id", "bin"))
      .filter(col("id_a") < col("id_b") && abs(col("us_a") - col("us_b")) <= 60000000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** Array-function coverage over the token array: sort/distinct/slice/join,
    * membership, negative indexing — one narrow codegen'd projection. */
  def arrayOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"), expr(TextQueries.wordsExpr).as("w"))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        expr("array_join(slice(array_sort(array_distinct(w)), 1, 5), ',')").as("first5"),
        array_contains(col("w"), "the").cast("long").as("has_the"),
        element_at(col("w"), -1).as("last_token"))
      .orderBy(col("doc_id"))

  /** Correlated scalar subqueries through the SQL front end — Catalyst
    * decorrelates both into left outer aggregate joins (one shuffle each),
    * which is exactly the 100 TB-safe plan; the text is also the oracle. */
  val scalarSubquerySql: String =
    """SELECT c_custkey, c_name,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |  (SELECT max(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c ORDER BY c_custkey""".stripMargin

  /** EXISTS + NOT IN subqueries (semi/anti decorrelation) via SQL. */
  val existsInSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** Per-nation top-2 customers by balance via a correlated LATERAL
    * subquery — the SQL front end's "top-k per outer row" shape (every
    * other per-group top-k in the corpus is a window; LATERAL is how a SQL
    * user writes it when the inner query is itself parameterized by the
    * outer row). Spark decorrelates this with a `DomainJoin`-based rewrite
    * into the same rank-limit plan a window would produce — declarative in,
    * scale-safe out. */
  private val lateralTopkSql =
    """SELECT n.n_name, t.c_custkey, t.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_custkey, c_acctbal FROM customer
      |         WHERE c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      |ORDER BY n.n_name, t.c_custkey""".stripMargin

  private def sqlOnViews(spark: SparkSession, dir: String, sql: String): DataFrame = {
    // A child session (shared context/conf/extensions, ISOLATED temp-view
    // catalog) so registering `customer`/`orders` cannot clobber same-named
    // views a caller holds in the shared session (review finding — the same
    // session-mutation class round 1 removed from plan building). The oracle
    // requires these exact names: DuckDB's views are named after the tables.
    val scoped = spark.newSession()
    val t = Tables(scoped, dir)
    t.customer.createOrReplaceTempView("customer")
    t.orders.createOrReplaceTempView("orders")
    t.nation.createOrReplaceTempView("nation")
    scoped.sql(sql)
  }

  def lateralTopk(spark: SparkSession, dir: String): DataFrame =
    sqlOnViews(spark, dir, lateralTopkSql)

  def scalarSubquery(spark: SparkSession, dir: String): DataFrame =
    sqlOnViews(spark, dir, scalarSubquerySql)

  def existsIn(spark: SparkSession, dir: String): DataFrame =
    sqlOnViews(spark, dir, existsInSql)

  /** Argmax/argmin as user-facing aggregates: per event type, WHICH event
    * carried the extreme value (and when) — `max_by`/`min_by`, the one-pass
    * partial-agg spelling of "the row where X is maximal" that replaces the
    * self-join or window-rank detour. Ties break on the lowest event_id via
    * the ordering struct (value, -event_id), mirroring the oracle's
    * `arg_max(..., (value, -event_id))` tuple ordering. */
  def argExtremes(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(
        max(col("value")).as("max_value"),
        max_by(struct(col("event_id"), Out.epochSec(col("ts")).as("t")),
          struct(col("value"), (-col("event_id")).as("tb"))).as("mx"),
        min(col("value")).as("min_value"),
        min_by(struct(col("event_id"), Out.epochSec(col("ts")).as("t")),
          struct(col("value"), col("event_id"))).as("mn"))
      .select(col("event_type"),
        col("max_value"), col("mx.event_id").as("max_event_id"), col("mx.t").as("max_ts"),
        col("min_value"), col("mn.event_id").as("min_event_id"), col("mn.t").as("min_ts"))
      .orderBy(col("event_type"))

  /** One-pass column profile of the events table — the ANALYZE-style
    * statistics a catalog keeps per table: row count, exact distinct key
    * cardinalities, null counts, min/max/avg per measure, event-time span.
    * Everything is a partial-agg (the distincts expand to Spark's two-phase
    * exact-distinct plan); one scan, no joins — the shape that profiles
    * 100 TB in one pass. Exact distincts are for low-cardinality columns;
    * high-cardinality profiling at scale swaps in `approx_count_distinct`
    * (see `q_approx_distinct`). */
  def profileEvents(spark: SparkSession, dir: String): DataFrame =
    EventQueries.parsed(Tables(spark, dir))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_k"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        Out.davg(col("value")).as("avg_value"),
        min(Out.epochSec(col("ts"))).as("min_ts"),
        max(Out.epochSec(col("ts"))).as("max_ts"))

  /** Deterministic stratified sample: exactly `n` events per event_type,
    * selected by MD5-hash order of the event id — a keyed reservoir that is
    * reproducible across cluster sizes and re-runs (the same property as
    * [[sampleHash]]'s rate sample, but with an exact per-stratum count,
    * which a training-mix recipe needs when strata have wildly different
    * sizes).
    *
    * Shape at scale: `row_number() ≤ n` over the stratum window triggers
    * Spark's WindowGroupLimit pushdown — each map task pre-prunes to its
    * local top-n per stratum BEFORE the shuffle, so the exchange carries
    * O(n · tasks) rows per stratum instead of the whole stratum, and the
    * final per-stratum rank touches O(n · tasks) rows — bounded work even
    * when a handful of strata span the full corpus (the case that makes a
    * naive per-group window one-task-per-group). PlanShapeSpec asserts the
    * pushdown is present. */
  def stratifiedSample(spark: SparkSession, dir: String, n: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("skey"), col("event_id"))
    Tables(spark, dir).events
      .select(col("event_id"), col("event_type"), col("value"),
        md5(concat(lit("smp:"), col("event_id").cast("string"))).as("skey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
      .select(col("event_type"), col("rn"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("rn"))
  }

  /** Robust outlier census via Median Absolute Deviation: per event type,
    * the exact median, the MAD, and how many readings sit more than
    * 3 × 1.4826 × MAD from the median (1.4826 scales MAD to σ under
    * normality). The robust companion to the 2σ z-score flags
    * ([[graft.ops.TimeseriesQueries]]): mean/σ move with the outliers they
    * are meant to catch; median/MAD have a 50% breakdown point, so a burst
    * of garbage readings cannot hide itself.
    *
    * Shape at scale: three NARROW passes over the measure column — (1)
    * grouped exact medians (sort-based agg, partition-local per key), (2)
    * deviation medians with the per-group medians broadcast back, (3) the
    * flag count with the metadata-sized stats broadcast back. Sequential
    * passes are inherent (MAD needs the median; the cutoff needs the MAD)
    * and each is a projection + broadcast join + partial agg — at 100 TB
    * three narrow scans beat persisting a corpus-sized intermediate. The
    * final comparison uses the UNROUNDED median/MAD (bit-identical
    * interpolation in both engines — the q_percentiles contract), so the
    * outlier count is deterministic; rounding is display-only. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events.select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withDev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val stats = withDev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), first(col("med")).as("med"),
        expr("percentile(adev, 0.5)").as("mad"))
    withDev.select(col("event_type"), col("value"))
      .join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"),
        count(when(abs(col("value") - col("med")) >
          lit(3.0) * lit(1.4826) * col("mad"), 1)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Data-quality constraint suite: one row per declared check with its
    * violation count — the dbt-test / Deequ-style gate a production pipeline
    * runs before publishing a snapshot (uniqueness, referential integrity,
    * value ranges, derived-column drift).
    *
    * Shape at scale: every per-table check is a single-pass conditional
    * aggregate (`count(when(cond, 1))` — map-side partials, no shuffle of
    * matching rows; the PK check's exact count-distinct is the standard
    * two-phase partial agg). The one join-shaped check (FK orphans) is a
    * left-anti equi-join AQE can plan as broadcast when the key side is
    * small. The five branches are independent subtrees of ONE union job —
    * Spark schedules them concurrently; nothing funnels through the driver
    * except the five result rows. */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def metric(name: String, oneRow: DataFrame): DataFrame =
      oneRow.select(lit(name).as("check_name"),
        col("n_bad").cast("long").as("n_bad"))
    Seq(
      // count(*) − count(DISTINCT k), NOT count(k): a NULL key must count as
      // a violation (count(k) skips NULLs, which would let a PK column full
      // of NULLs pass — and diverge from the oracle's count(*))
      metric("orders_pk_dup", t.orders.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_bad"))),
      metric("lineitem_fk_orphan", t.lineitem
        .join(t.orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_bad"))),
      metric("customer_negative_acctbal", t.customer.agg(
        count(when(col("c_acctbal") < 0, 1)).as("n_bad"))),
      metric("documents_nchars_drift", t.documents.agg(
        count(when(col("n_chars") =!= length(col("text")), 1)).as("n_bad"))),
      metric("events_value_out_of_range", t.events.agg(
        count(when(col("value") < 0 || col("value").isNull, 1)).as("n_bad"))))
      .reduce(_ unionByName _)
      .orderBy(col("check_name"))
  }

  /** Z-order layout census: quantize lineitem onto a (price, ship-day) grid,
    * interleave the cells into Morton z-values with the native
    * [[graft.functions.ZOrder2 graft_zorder]] kernel, and report each
    * z-bucket's row count and bounding box.
    *
    * This is the DECISION QUERY for multi-dimensional data layout. Writing
    * 100 TB clustered by z-value (`repartitionByRange(zval) +
    * sortWithinPartitions(zval)`) gives every file/row-group a tight
    * min/max box in BOTH dimensions, so parquet's column statistics prune
    * scans for filters on either column — single-key sorting only ever
    * prunes one. The census output IS the skip-effectiveness evidence: each
    * bucket's (x_lo..x_hi, y_lo..y_hi) box is what a scan predicate would
    * be checked against, and narrow boxes ⇒ most buckets skipped. The
    * whole query is one codegen'd projection plus one partial-agg shuffle
    * keyed by bucket — no sort, no join; cheap enough to run as a layout
    * advisor over a full corpus. */
  def zorderLayout(spark: SparkSession, dir: String,
      bucketShift: Int = 20): DataFrame = {
    // Both dimensions are normalized onto the FULL 16-bit cell range — the
    // calibration step every z-order layout needs: if one dimension only
    // occupies low bits (raw day indexes span ~2500 values ≈ 11 bits), its
    // varying bits all sit below the other's and a z-range split degenerates
    // to a single-key sort. Constants are the corpus's fixed calibration
    // (price ∈ [0, 110000), ship day ∈ [9131, 11651) days-since-epoch); a
    // production advisor derives them from table stats once per layout run.
    // both cells clamped to the 16-bit range the oracle's interleave covers
    // (an out-of-calibration price would otherwise set cx bit 16, which the
    // kernel spreads to zval bit 32 but the 16-term oracle drops — silent
    // divergence instead of a saturated edge cell)
    val priceCell = least(greatest(
      floor(col("l_extendedprice") * 65535.0 / 110000.0).cast("long"),
      lit(0L)), lit(65535L))
    // epoch seconds are < 2^53, so the double division is exact; ship dates
    // are midnights, so trunc ≡ DuckDB's floor-division `// 86400`
    val day = (Out.epochSec(col("l_shipdate")) / 86400).cast("long")
    val dayCell = least(greatest((day - 9131) * 26, lit(0L)), lit(65535L))
    Tables(spark, dir).lineitem
      .select(priceCell.as("cx"), dayCell.as("cy"))
      .withColumn("zval", call_function("graft_zorder", col("cx"), col("cy")))
      .groupBy(shiftright(col("zval"), bucketShift).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("cx")).as("x_lo"), max(col("cx")).as("x_hi"),
        min(col("cy")).as("y_lo"), max(col("cy")).as("y_hi"))
      .orderBy(col("bucket"))
  }

  /** Join-key skew audit — the monitor behind the salting decision
    * ([[SkewJoin]]): for each candidate join key, the distinct-key count,
    * total rows, heaviest key's share, and the skew ratio max/mean. A
    * 100 TB deployment runs this BEFORE picking join strategies; a ratio
    * near 1 means hash partitioning balances, a large one means the top
    * key needs salting or an AQE skew split.
    *
    * Shape at scale: per key column, one partial-aggregated shuffle on the
    * key (counts), then metadata-scale aggregates — the per-column stats
    * row and the max-count filter both run over the distinct-key relation,
    * never the facts, and the final join is on the 3-row `key_col` side.
    * The heaviest key is `min(key) WHERE n = max_n` (two tiny aggregates),
    * not a window — no global sort anywhere.
    *
    * Determinism: counts are exact; `skew_ratio` is one double formula
    * rounded at 6dp; ties on the max count resolve to the smallest key. */
  def keySkewAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val keyed = t.lineitem.select(lit("l_partkey").as("key_col"),
        col("l_partkey").as("key"))
      .unionAll(t.lineitem.select(lit("l_suppkey"), col("l_suppkey")))
      .unionAll(t.orders.select(lit("o_custkey"), col("o_custkey")))
      .where(col("key").isNotNull)
    val counts = keyed.groupBy(col("key_col"), col("key"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.groupBy(col("key_col"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total"),
        max(col("n")).as("max_n"))
    val top = counts.join(stats, Seq("key_col"))
      .where(col("n") === col("max_n"))
      .groupBy(col("key_col")).agg(min(col("key")).as("top_key"))
    stats.join(top, Seq("key_col"))
      .select(col("key_col"), col("n_keys"), col("total"), col("max_n"),
        col("top_key"),
        round(col("max_n").cast("double") /
          (col("total").cast("double") / col("n_keys").cast("double")), 6)
          .as("skew_ratio"))
      .orderBy(col("key_col"))
  }

  /** Epoch-seconds origin for the OLS time axis (2024-01-01T00:00:00Z, just
    * before the events fixture starts). Centering x near zero keeps the
    * moment sums small — x² ≤ ~7e12 per row instead of ~3e18 — so the
    * decimal partial sums stay far from the (38,8) ceiling even at 100 TB
    * row counts, and the double-precision cancellation in n·Sxx − Sx² keeps
    * ~10 more significant digits. The constant is part of the query
    * contract (shared with the oracle), NOT a data-derived min — a
    * data-derived origin would need an extra full pass and would make the
    * slope non-reproducible under late-arriving data. */
  val OlsEpochBase = 1704067200L

  /** Per-event-type OLS trend of `value` over time: slope (units/second),
    * intercept (at the fixed origin), and R², from one pass of decimal-exact
    * moment sums — the scalable, deterministic spelling of
    * `regr_slope`/`regr_intercept`/`regr_r2`. Same shape as [[corrStats]]:
    * one partial-aggregated shuffle on a low-cardinality key, division in
    * double at the very end, degenerate groups (n ≤ 1, zero variance)
    * answered with NULL on both engines. */
  def trendOls(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        (Out.epochSec(col("ts")) - OlsEpochBase).cast("decimal(18,4)").as("x"),
        col("value").cast("decimal(18,4)").as("y"))
    e.groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      .select(
        col("event_type"),
        col("n").cast("long").as("n"),
        when(col("n") > 1 && (col("n") * col("sxx") - col("sx") * col("sx")) > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)).as("slope"),
        when(col("n") > 1 && (col("n") * col("sxx") - col("sx") * col("sx")) > 0,
          round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
              (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
            col("n"), 6)).as("intercept"),
        // R² = cov² / (varx · vary); both denominators guarded > 0 (a
        // constant-y group has no explainable variance — NULL, not 0/0).
        when(col("n") > 1 && (col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("n") * col("syy") - col("sy") * col("sy")) > 0,
          round(((col("n") * col("sxy") - col("sx") * col("sy")) *
              (col("n") * col("sxy") - col("sx") * col("sy"))) /
            ((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 6)).as("r2"))
      .orderBy(col("event_type"))
  }

  /** Benford first-digit expectations log10(1 + 1/d), rounded to 6 dp in
    * Scala so BOTH engines receive the identical literal (no cross-engine
    * log10 in the compared output). */
  val BenfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> BigDecimal(math.log10(1.0 + 1.0 / d))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Benford's-law digit census over order totals — the classic
    * fabricated-data / pipeline-corruption screen: the observed
    * first-significant-digit distribution against log10(1 + 1/d).
    *
    * Determinism: the first digit is extracted in INTEGER space — cents =
    * round(price·100) (2-dp money doubles land exactly; never within 1e-7
    * of a .5 boundary), then the first character of the integer's string
    * form, which is locale-free and identical in both engines — never
    * log10-of-double (a value at a power of 10 could floor either way).
    *
    * Shape at scale: one narrow projection → 9-group partial agg; the
    * share window runs over the 9-row aggregate (metadata), never the
    * fact. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables(spark, dir).orders
      .filter(col("o_totalprice") > 0)
      .select(substring(round(col("o_totalprice") * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val expected = BenfordExpected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, e)) => when(col("digit") === d, lit(e)).otherwise(acc)
    }
    import org.apache.spark.sql.expressions.Window
    digits
      .withColumn("obs_pct",
        round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(lit(1))), 6))
      .withColumn("exp_pct", expected)
      .orderBy(col("digit"))
  }

  /** The categorical columns profiled by [[columnEntropy]]:
    * (output label, table, column). */
  val EntropyColumns: Seq[(String, String, String)] = Seq(
    ("documents.lang", "documents", "lang"),
    ("documents.source", "documents", "source"),
    ("events.event_type", "events", "event_type"),
    ("orders.o_orderpriority", "orders", "o_orderpriority"))

  /** Shannon entropy census of the categorical columns — the
    * class-balance / skew screen a training-data pipeline runs before
    * sampling decisions (a near-zero-entropy "language" column means the
    * corpus is monolingual no matter how many labels exist).
    *
    * Determinism: each −Σ p·ln p rides the [[PipelineQueries.driftPsi]]
    * contract — per-term doubles cast to DECIMAL(38,12) so the SUM is
    * order-independent, one double division by ln 2 at the end, round 6.
    *
    * Shape at scale: one partial-agg shuffle per column to its value
    * census (cardinality-sized); the entropy fold runs over that metadata.
    * The four columns are independent subtrees of one union job. */
  def columnEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    def one(label: String, df: DataFrame, c: String): DataFrame = {
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(c).as("v"))
        .agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
      val p = col("c").cast("double") / col("n").cast("double")
      counts.agg(
        max(col("n")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        round((-sum((p * log(p)).cast("decimal(38,12)")).cast("double")) /
          log(lit(2.0)), 6).as("entropy_bits"))
        .select(lit(label).as("col_name"), col("n_rows"),
          col("n_distinct"), col("entropy_bits"))
    }
    EntropyColumns.map { case (label, table, c) =>
      val df = table match {
        case "documents" => t.documents
        case "events" => t.events
        case "orders" => t.orders
      }
      one(label, df, c)
    }.reduce(_ unionByName _).orderBy(col("col_name"))
  }

  /** Winsorization tail quantiles for [[winsorizedStats]]. */
  val WinsorLo = 0.05
  val WinsorHi = 0.95

  /** Winsorized summary per event type: p05/p95 clamp bounds, raw vs
    * winsorized mean, and the clamped-row count — the outlier-robust
    * normalization step before z-scoring or feature scaling (MAD's
    * cousin: clamp, don't drop).
    *
    * Determinism: clamping compares against the UNROUNDED interpolated
    * quantiles (`percentile` ≡ `quantile_cont`, identical interpolation
    * formula; a value can only tie the quantile when the quantile IS that
    * data point, where least/greatest is the identity either way); both
    * means ride the exact-decimal [[Out.davg]] contract.
    *
    * Shape at scale: pass 1 is a grouped sort-agg to per-type quantiles
    * (metadata-sized); the bounds broadcast back onto the same scan for
    * the clamp + re-agg — the fact shuffles once per pass, never sorts
    * globally. */
  def winsorizedStats(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr(s"percentile(value, $WinsorLo)").as("p05"),
        expr(s"percentile(value, $WinsorHi)").as("p95"))
    val clamped = least(greatest(col("value"), col("p05")), col("p95"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(max(col("p05")), 4).as("p05"),
        round(max(col("p95")), 4).as("p95"),
        round(Out.davg(col("value")), 6).as("raw_mean"),
        round(Out.davg(clamped), 6).as("wins_mean"),
        sum(when(col("value") < col("p05") ||
          col("value") > col("p95"), 1L).otherwise(0L)).as("n_clamped"))
      .orderBy(col("event_type"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per source: the exact
    * supremum gap D = sup |F_src − F_rest| between each source's document
    * length ECDF and the rest of the corpus, plus the length at which the
    * gap is attained — the distribution-shape counterpart of
    * [[graft.ops.PipelineQueries.driftPsi]]'s binned PSI (KS is
    * bin-free: it catches shape drift PSI's 10-bin grid can smooth away).
    *
    * The supremum must be evaluated at EVERY distinct value, not just the
    * source's own observations — between a source's jumps its ECDF is flat
    * while the rest's keeps rising, so the max gap can land on a value the
    * source never takes. Hence the sources × value-domain grid.
    *
    * Shape at scale: one partial-agg shuffle to the (source, length) grain
    * does all data-sized work; the value-domain census is a bounded
    * second aggregate (document lengths are a bounded integer domain —
    * the same calendar-grain argument as
    * [[graft.ops.TimeseriesQueries.cusumChangepoint]]); the grid is
    * sources × |domain| metadata, its cumulative windows partition per
    * source, and the final stats are one more metadata agg.
    *
    * Determinism: every ECDF value is an exact-integer ratio evaluated as
    * the same double division in both engines, so the max and its
    * argmin-value equality join cannot diverge; output D rounds at 6 dp. */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
      .select(col("source"), col("n_chars").cast("long").as("v"))
    val perSV = docs.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("n"))
    val perSrc = perSV.groupBy(col("source")).agg(sum(col("n")).as("n_src"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    // cumulative census over the bounded value domain (single ordered
    // window over |domain| rows — metadata, not data)
    val perV = perSV.groupBy(col("v")).agg(sum(col("n")).as("nv"))
      .withColumn("cum_tot",
        sum(col("nv")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val grid = perSrc.crossJoin(broadcast(perV.select(col("v"), col("cum_tot"))))
      .join(perSV, Seq("source", "v"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("cum_src",
        sum(col("n")).over(Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .withColumn("gap",
        abs(col("cum_src").cast("double") / col("n_src") -
          (col("cum_tot") - col("cum_src")).cast("double") /
            (col("n_total") - col("n_src"))))
    val stats = grid.groupBy(col("source"))
      .agg(max(col("gap")).as("ks_raw"), max(col("n_src")).as("n_src"),
        max(col("n_total") - col("n_src")).as("n_rest"))
    val at = grid.join(stats.select(col("source"), col("ks_raw")),
        Seq("source"))
      .filter(col("gap") === col("ks_raw"))
      .groupBy(col("source")).agg(min(col("v")).as("d_at"))
    stats.join(at, Seq("source"))
      .select(col("source"), col("n_src"), col("n_rest"),
        round(col("ks_raw"), 6).as("ks_d"), col("d_at"))
      .orderBy(col("source"))
  }

  /** Equi-depth histogram: per event type, four quartile-bounded bins with
    * their actual counts and value ranges — the companion to the
    * fixed-width `q_histogram` (equi-depth adapts bin edges to the data,
    * which is what an optimizer's column statistics and a skew audit
    * actually want; fixed-width bins collapse under heavy tails).
    *
    * Shape at scale: one grouped sort-agg computes the three interior
    * quartile edges per type (metadata-sized — same machinery as
    * `q_percentiles`); edges broadcast back onto the scan and the bin
    * assignment is a codegen'd CASE, so the binning pass is one
    * partial-agg shuffle to the (type, bin) grain.
    *
    * Determinism: edges are the interpolated quantiles both engines
    * compute identically on identical doubles (the `q_winsorize` parity);
    * bin assignment compares UNROUNDED edges; only displayed edges round. */
  def histogramEquidepth(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val edges = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("q1"),
        expr("percentile(value, 0.50)").as("q2"),
        expr("percentile(value, 0.75)").as("q3"))
    ev.join(broadcast(edges), Seq("event_type"))
      .select(col("event_type"), col("value"),
        when(col("value") <= col("q1"), 0L)
          .when(col("value") <= col("q2"), 1L)
          .when(col("value") <= col("q3"), 2L)
          .otherwise(3L).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 4).as("lo"),
        round(max(col("value")), 4).as("hi"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** Pearson chi-square test of independence between `lang` and `source`
    * over `documents` — the categorical complement to [[corrStats]]: is the
    * language mix the same in every source, or does provenance predict
    * language? (In a training pipeline a big χ² flags that per-source
    * sampling rates will SHIFT the language mix, so [[PipelineQueries]]'
    * domain-mix and epoch-plan rates can't be tuned independently.)
    *
    * Exactness: observed counts and marginals are integers; each cell's
    * expected count is one double division (row·col/N, bit-identical
    * across engines); the (O−E)²/E terms are truncated to DECIMAL(38,12)
    * before the sum so partition order cannot move the rounded statistic.
    * Shape at scale: one count shuffle keyed by (lang, source) — cell
    * cardinality is |langs|·|sources|, metadata-scale — then marginals and
    * the grid are broadcast-joined; the corpus is scanned once. Zero cells
    * are real terms (E > 0 always; O = 0 contributes E), hence the full
    * marginal cross-grid rather than only the observed cells. */
  def chisqIndependence(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir).documents
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o")).persist()
    val rows = cells.groupBy(col("lang")).agg(sum(col("o")).as("rl"))
    val cols = cells.groupBy(col("source")).agg(sum(col("o")).as("cs"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val grid = rows.crossJoin(broadcast(cols)).crossJoin(broadcast(tot))
      .join(cells, Seq("lang", "source"), "left")
      .select(col("n"),
        coalesce(col("o"), lit(0L)).cast("double").as("o"),
        (col("rl").cast("double") * col("cs").cast("double") /
          col("n").cast("double")).as("e"))
    val term = (col("o") - col("e")) * (col("o") - col("e")) / col("e")
    grid.groupBy(col("n"))
      .agg(count(lit(1)).as("n_cells"),
        round(sum(term.cast("decimal(38,12)")).cast("double"), 6).as("chi2"))
      .select(col("n").as("n_docs"), col("n_cells"), col("chi2"))
      .orderBy(col("n_docs"))
  }

  /** Statistical mode per group: each event type's most frequent (rounded)
    * value with its share — the categorical central tendency the
    * mean/percentile family can't report. Deterministic tiebreak: the
    * SMALLEST value among equally-frequent candidates, via `max_by` over
    * the (count, −value) ordering struct — a partial-agg argmax, never a
    * window over the value census. Two partial-agg shuffles: the
    * (type, value) census, then the per-type argmax + total. */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val census = Tables(spark, dir).events
      .where(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), round(col("value"), 0).as("v"))
      .agg(count(lit(1)).as("n"))
    census.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_total"),
        max_by(col("v"), struct(col("n"), (-col("v")).as("tb"))).as("mode_value"),
        max(struct(col("n"), (-col("v")).as("tb"))).getField("n").as("mode_n"))
      .select(col("event_type"), col("mode_value"), col("mode_n"),
        col("n_total"),
        round(col("mode_n").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("event_type"))
  }

  /** Exact WEIGHTED percentiles (p50/p90) of extended price per return
    * flag, weighted by quantity — the quantile of "a dollar-per-unit
    * shipped", not "a line item": a 1-unit and a 50-unit line count the
    * same to [[percentiles]] but differ 50× here. No Spark builtin exists;
    * the classic spelling is a per-group cumulative-weight sweep: sort by
    * value, running weight sum, report the first value whose cumulative
    * weight crosses q·total.
    *
    * Determinism: weights are 2dp-clean doubles → exact DECIMAL sums, and
    * the crossing predicate is the all-decimal `2·cumw ≥ tot` (resp.
    * `10·cumw ≥ 9·tot`) — no floating threshold anywhere, so both engines
    * pick the identical crossing row even at exact-tie boundaries. The
    * sweep order is pinned by the unique (price, orderkey, linenumber).
    *
    * Shape at scale: ONE window shuffle on the group key (each group's
    * sweep is partition-local), then a partial-agg min over the crossing
    * rows — the [[percentiles]] regime with a weighted measure. */
  def weightedPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = Tables(spark, dir).lineitem
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("p"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(Out.SumDecimal).as("w"))
    val sweep = Window.partitionBy(col("flag"))
      .orderBy(col("p"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rows.groupBy(col("flag"))
      .agg(sum(col("w")).as("tot"), count(lit(1)).as("n"))
    rows
      .withColumn("cumw", sum(col("w")).over(sweep))
      .join(broadcast(tot), Seq("flag"))
      .groupBy(col("flag"))
      .agg(
        min(col("n")).as("n"),
        round(min(col("tot")).cast("double"), 4).as("w_total"),
        min(when(col("cumw") * 2 >= col("tot"), col("p"))).as("wp50"),
        min(when(col("cumw") * 10 >= col("tot") * 9, col("p"))).as("wp90"))
      .orderBy(col("flag"))
  }

  /** Resample count for [[bootstrapCi]] (shared with the oracle SQL). */
  val BootstrapB = 16

  /** Deterministic multiplier-bootstrap confidence interval for the mean of
    * `events.value` per event type: each of [[BootstrapB]] resamples
    * reweights every row by a hash-derived multiplier w ∈ {0, 1, 2}
    * (mean 1 — the integer stand-in for the Poisson(1) weights of the
    * classic online bootstrap, cf. Owen & Eckles, "Bootstrapping data
    * arrays"), computes its weighted mean, and the CI is the exact
    * [2.5, 97.5] percentile band of the B resample means around the plain
    * point estimate. Hash-derived weights make the resampling REPRODUCIBLE
    * across engines, partitionings, and reruns — the property that lets an
    * oracle (or a rerun on a 1000-executor cluster) land on bit-identical
    * intervals, which no RNG-based bootstrap has.
    *
    * Shape at scale: the B-fold explode is map-side (each row contributes
    * its B weighted terms to a partial agg); the shuffle carries only
    * groups × B cells, and the percentile runs over B values per group —
    * metadata. Weighted sums are decimal-exact; each mean is one double
    * division; percentile ≡ quantile_cont parity as in [[percentiles]]. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextQueries.hash48
    val cells = Tables(spark, dir).events
      .where(col("event_type").isNotNull && col("value").isNotNull &&
        col("event_id").isNotNull)
      .select(col("event_type"), col("event_id"),
        col("value").cast(Out.SumDecimal).as("v"),
        explode(expr(s"sequence(0, ${BootstrapB - 1})")).as("b"))
      .withColumn("w",
        expr(hash48(s"concat(b, ':', event_id)")) % 3)
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w").cast(Out.SumDecimal) * col("v")).as("ws"),
        sum(col("w")).as("wn"))
      .filter(col("wn") > 0)
      .select(col("event_type"), col("b"),
        (col("ws").cast("double") / col("wn").cast("double")).as("mb"))
    val point = Tables(spark, dir).events
      .where(col("event_type").isNotNull && col("value").isNotNull &&
        col("event_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(Out.davg(col("value")), 6).as("mean"))
    cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_resamples"),
        round(expr("percentile(mb, 0.025)"), 6).as("ci_lo"),
        round(expr("percentile(mb, 0.975)"), 6).as("ci_hi"))
      .join(point, Seq("event_type"))
      .select(col("event_type"), col("n"), col("mean"),
        col("n_resamples"), col("ci_lo"), col("ci_hi"))
      .orderBy(col("event_type"))
  }

  /** Zone-map skip audit: ship-week buckets × a conjunctive predicate.
    * Days-since-epoch window of the audited date predicate (ship days span
    * [9131, 11651) in the corpus) and the price band, shared with the oracle. */
  val SkipDayLo = 9800L
  val SkipDayHi = 9860L
  val SkipPriceLo = 20000.0
  val SkipPriceHi = 70000.0

  /** Data-skipping audit for a ship-week layout: per weekly bucket, the
    * min/max zone maps a lakehouse format (parquet row groups, Delta/Iceberg
    * file stats) would store for `l_shipdate` and `l_extendedprice`, and the
    * bucket's fate under the conjunctive predicate
    * `shipdate ∈ [SkipDayLo, SkipDayHi) AND price ∈ [SkipPriceLo,
    * SkipPriceHi)`: `pruned` (either dimension's zone is disjoint — the scan
    * never opens the bucket), `full` (both zones entirely inside — the
    * predicate is decided by metadata alone), or `partial` (must scan and
    * filter). `n_match` counts the rows that actually satisfy the predicate,
    * so `n_rows − n_match` over partial buckets is the false-positive scan
    * volume — the number the layout advisor minimizes (cf. [[zorderLayout]],
    * which produces the layout this query audits).
    *
    * Shape at scale: this is metadata computation — ONE narrow scan, one
    * partial-aggregated shuffle on the bucket key, output rows = number of
    * buckets. Exactly how a real skipping audit runs over file-level stats,
    * except the stats here are derived in-query because the testdata is a
    * single file. All comparisons are integer-day or exact stored-double;
    * min/max pick stored values, so the output hashes identically. */
  def dataskipAudit(spark: SparkSession, dir: String): DataFrame = {
    val day = (Out.epochSec(col("l_shipdate")) / 86400).cast("long")
    val pred = col("day").between(SkipDayLo, SkipDayHi - 1) &&
      col("l_extendedprice") >= SkipPriceLo && col("l_extendedprice") < SkipPriceHi
    val zones = Tables(spark, dir).lineitem
      .select(day.as("day"), col("l_extendedprice"))
      .groupBy((col("day") / 7).cast("long").as("wk"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("day")).as("day_lo"), max(col("day")).as("day_hi"),
        min(col("l_extendedprice")).as("price_lo"),
        max(col("l_extendedprice")).as("price_hi"),
        sum(when(pred, 1L).otherwise(0L)).as("n_match"))
    zones
      .withColumn("cls",
        when(col("day_hi") < SkipDayLo || col("day_lo") >= SkipDayHi ||
          col("price_hi") < SkipPriceLo || col("price_lo") >= SkipPriceHi,
          lit("pruned"))
          .when(col("day_lo") >= SkipDayLo && col("day_hi") < SkipDayHi &&
            col("price_lo") >= SkipPriceLo && col("price_hi") < SkipPriceHi,
            lit("full"))
          .otherwise(lit("partial")))
      .select(col("wk"), col("n_rows"), col("day_lo"), col("day_hi"),
        col("price_lo"), col("price_hi"), col("cls"), col("n_match"))
      .orderBy(col("wk"))
  }

  /** Corpus-half profile drift: the event stream split at the midpoint of
    * its time span (a data-derived constant — no configured cutoff to go
    * stale), each half profiled in one pass (rows, null rate, exact-decimal
    * mean, distinct types/users), plus per-metric deltas. This is the
    * cheap "did the distribution move between loads" screen run before the
    * binned detectors ([[q_drift_psi]]/KS) are pointed at a column.
    *
    * Shape at scale: the span endpoints are a 1-row aggregate broadcast
    * into the scan (the [[q_tpch22_idle]] threshold move); each half's
    * profile is conditional partial aggs in ONE shared pass (never two
    * scans); distincts are Spark's exact two-phase spellings. Output is 2
    * rows + metadata arithmetic. */
  def profileDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .where(col("ts").isNotNull)
      .select(Out.epochSec(col("ts")).as("sec"), col("value"),
        col("event_type"), col("user_id"))
    val mid = ev.agg(((min(col("sec")) + max(col("sec"))) / 2).cast("long").as("mid"))
    ev.crossJoin(broadcast(mid))
      .withColumn("half", when(col("sec") < col("mid"), lit("h1_early"))
        .otherwise(lit("h2_late")))
      .groupBy(col("half"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
        round(Out.davg(col("value")), 6).as("avg_value"),
        countDistinct(col("event_type")).as("n_types"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("half"))
  }
}
