package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Relational batch operators — the extension surface beyond the reference's
  * stream job (SURVEY.md §2.3: the reference has no joins, sorts, analytic
  * windows, grouping sets, or set ops; the rebuild owns them natively).
  *
  * Scale notes (100 TB design point):
  *   - fact⋈fact joins (orders⋈customer at scale) stay shuffle hash/sort-merge
  *     on the join key — AQE picks the strategy and splits skewed partitions;
  *   - dimension joins (nation, region) are explicitly `broadcast()` — a
  *     bounded-size dim must never shuffle the fact side;
  *   - top-k is `orderBy().limit(k)` which Spark plans as
  *     TakeOrderedAndProject: per-partition heaps + driver merge of k rows,
  *     never a global sort;
  *   - analytic windows shuffle once on the partition key; frames are bounded.
  */
object RelationalQueries {

  /** Constants shared with the oracle SQL via interpolation — duplicating a
    * literal on both sides is the keep-in-sync hazard this registry
    * convention exists to remove (a changed default desyncs the gate with
    * an opaque hash mismatch instead of failing at build time). */
  val RangeFrameSec: Long = 30L * 86400L // trailing window span
  val Tpch3Segment = "BUILDING"
  val Tpch3Cutoff = "1998-06-01"
  val Tpch3K = 10
  val Tpch5Region = "ASIA"
  val Tpch5YearStart = "1996-01-01"
  val Tpch5YearEnd = "1997-01-01"
  val Tpch18MinQty = 300.0
  val Tpch18K = 100

  /** Inner equi-join fact⋈dim (orders⋈customer). */
  def joinInner(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders.join(t.customer, col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Left outer join + aggregate: per-customer order stats, keeping
    * order-less customers (COUNT of non-null = 0). */
  def joinLeft(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        Out.dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("c_custkey"))
  }

  /** Left-semi join (EXISTS): customers having any order > 400k. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bigOrders = t.orders.filter(col("o_totalprice") > 400000.0)
    t.customer.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no high-value (>450k)
    * order. The filter on the right side is applied before the join so the
    * anti-join's build side shrinks (and produces a non-empty result on the
    * dense-FK testdata, unlike "no orders at all"). */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.orders.filter(col("o_totalprice") > 450000.0)
    t.customer.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Star join with explicit broadcast of the bounded dims (nation: 25 rows,
    * region: 5 rows — broadcast regardless of fact-side size). */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), Out.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-k: 100 most expensive orders. Planned as TakeOrderedAndProject
    * (bounded memory at any scale), tie-broken on the unique key. */
  def sortLimitTopK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  /** Ranking window functions: top-3 orders per customer. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir).orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rnk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Analytic window functions with frames: lag/lead + running and moving
    * sums per customer order history (decimal-exact, see Out). */
  def windowLagFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val dec = col("o_totalprice").cast(Out.SumDecimal)
    Tables(spark, dir).orders
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("running_sum",
        sum(dec).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("moving_sum3",
        sum(dec).over(w.rowsBetween(-2, Window.currentRow)).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        Out.epochSec(col("o_orderdate")).as("order_ts"),
        col("o_totalprice"), col("prev_price"), col("next_price"),
        col("running_sum"), col("moving_sum3"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Subtotal labels via GROUPING(), not a bare COALESCE: a real NULL key
    * on realistic data would otherwise collide with the subtotal marker —
    * two rows labeled ('ALL', x) with different measures, which breaks the
    * total order the hash gate needs AND is semantically ambiguous. The
    * grouping bit separates them: subtotal → 'ALL', genuine NULL →
    * '<NULL>'. Same CASE in the oracle SQL. */
  private def gLabel(key: Column): Column =
    when(grouping(key) === 1, lit("ALL"))
      .otherwise(coalesce(key, lit("<NULL>")))

  private def grouped(df: org.apache.spark.sql.RelationalGroupedDataset): DataFrame = df
    .agg(count(lit(1)).as("n"),
      Out.dsum(col("l_quantity")).as("sum_qty"),
      Out.dsum(col("l_extendedprice")).as("sum_price"),
      gLabel(col("l_returnflag")).as("g_flag"),
      gLabel(col("l_linestatus")).as("g_status"))

  /** ROLLUP over (returnflag, linestatus); subtotal markers labeled via
    * [[gLabel]] so the output stays string-typed and oracle-comparable. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    grouped(Tables(spark, dir).lineitem.rollup(col("l_returnflag"), col("l_linestatus")))
      .select(col("g_flag"), col("g_status"),
        col("n"), col("sum_qty"), col("sum_price"))
      .orderBy(col("g_flag"), col("g_status"))

  /** CUBE over the same keys. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    grouped(Tables(spark, dir).lineitem.cube(col("l_returnflag"), col("l_linestatus")))
      .select(col("g_flag"), col("g_status"),
        col("n"), col("sum_qty"), col("sum_price"))
      .orderBy(col("g_flag"), col("g_status"))

  /** GROUPING SETS via the SQL surface (temp view + spark.sql) — exercises
    * the engine's SQL entry point alongside the DataFrame API. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    // child session: an isolated temp-view catalog, so registering the view
    // cannot clobber (or leak into) the caller's shared session — the same
    // scoped pattern as StatsQueries.sqlOnViews (review finding).
    val scoped = spark.newSession()
    Tables(scoped, dir).lineitem.createOrReplaceTempView("graft_lineitem")
    scoped.sql(
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
        |            ELSE COALESCE(l_returnflag, '<NULL>') END AS g_flag,
        |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
        |            ELSE COALESCE(l_linestatus, '<NULL>') END AS g_status,
        |       COUNT(1) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty
        |FROM graft_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status""".stripMargin)
  }

  private def segBuilding(t: Tables): DataFrame =
    t.customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
  private def segRich(t: Tables): DataFrame =
    t.customer.filter(col("c_acctbal") > 7000.0).select(col("c_custkey"))

  /** UNION (distinct) of two customer segments. */
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    segBuilding(t).union(segRich(t)).distinct().orderBy(col("c_custkey"))
  }

  /** INTERSECT of the segments. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    segBuilding(t).intersect(segRich(t)).orderBy(col("c_custkey"))
  }

  /** EXCEPT (building customers that are not rich). */
  def setExcept(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    segBuilding(t).except(segRich(t)).orderBy(col("c_custkey"))
  }

  /** EXCEPT ALL — multiplicity-preserving difference (bag semantics): each
    * row survives max(0, n_left − n_right) times. Over order priorities per
    * customer so duplicates genuinely occur; the engine plans the same
    * partial-agg-shaped rewrite DuckDB uses (count both sides, replicate
    * the difference), never a row-at-a-time loop. */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val l = t.orders.filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey"), col("o_orderpriority"))
    val r = t.orders.filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey"), col("o_orderpriority"))
    l.exceptAll(r)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_custkey"), col("o_orderpriority"))
  }

  /** FULL OUTER join: the reconciliation shape — every customer and every
    * order-bearing key survives, nulls mark the unmatched side. Key is
    * COALESCEd from both sides (the standard full-outer key recovery).
    * Aggregated so both null-sides are visible in a bounded output. */
  def joinFull(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val bigSpenders = t.orders.filter(col("o_totalprice") > 400000.0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
    val building = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    building.join(bigSpenders, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        when(col("c_custkey").isNull, lit("order_only"))
          .when(col("o_custkey").isNull, lit("customer_only"))
          .otherwise(lit("both")).as("side"))
      .orderBy(col("custkey"))
  }

  /** String scalar-function coverage over part. */
  def scalarString(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part.select(
      col("p_partkey"),
      upper(col("p_name")).as("u_name"),
      lower(col("p_brand")).as("l_brand"),
      substring(col("p_type"), 1, 5).as("type5"),
      length(col("p_name")).cast("long").as("name_len"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      regexp_replace(col("p_name"), " ", "_").as("snake_name"),
      lpad(col("p_brand"), 12, "*").as("pad_brand"),
      reverse(col("p_name")).as("rev_name"),
      when(col("p_type").like("%BRASS%"), lit(1L)).otherwise(lit(0L)).as("is_brass")
    ).orderBy(col("p_partkey"))

  /** Date/time scalar-function coverage over orders. */
  def scalarDate(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"),
      month(col("o_orderdate")).cast("long").as("o_month"),
      dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
      quarter(col("o_orderdate")).cast("long").as("o_quarter"),
      Out.epochSec(date_trunc("month", col("o_orderdate"))).as("month_start"),
      Out.epochSec(col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due_ts"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long")
        .as("days_since_epoch_start")
    ).orderBy(col("o_orderkey"))

  /** Math scalar-function coverage over lineitem (IEEE-exact ops only:
    * sqrt/abs/ceil/floor/mod and explicit multiplication — no libm-divergent
    * transcendentals in oracle-checked outputs). */
  def scalarMath(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem.select(
      col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      round(col("l_extendedprice"), 1).as("price_r1"),
      abs(col("l_discount") - 0.05).as("disc_dev"),
      ceil(col("l_quantity")).cast("long").as("qty_ceil"),
      floor(col("l_quantity")).cast("long").as("qty_floor"),
      sqrt(col("l_extendedprice")).as("price_sqrt"),
      ((lit(1.0) + col("l_tax")) * (lit(1.0) + col("l_tax"))).as("tax_sq"),
      (col("l_orderkey") % 7).as("key_mod7")
    ).orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Flagship batch query: TPC-H Q1-style pricing summary.
    * Filter pushed to the parquet scan; one partial+final hash aggregate.
    * The price×discount×tax products are computed in DECIMAL arithmetic
    * (exact, associative) rather than double — a double product cast to
    * decimal rounds differently across engines AND across partitionings. */
  def tpch1Pricing(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val priceDec = col("l_extendedprice").cast(DecimalType(12, 2))
    val discF = (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))
    val taxF = (lit(1.0) + col("l_tax")).cast(DecimalType(4, 2))
    Tables(spark, dir).lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Out.dsum(col("l_quantity")).as("sum_qty"),
        Out.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(priceDec * discF).cast("double").as("sum_disc_price"),
        sum(priceDec * discF * taxF).cast("double").as("sum_charge"),
        Out.davg(col("l_quantity")).as("avg_qty"),
        Out.davg(col("l_extendedprice")).as("avg_price"),
        Out.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Relative-error tolerance the HLL++ sketch is held to in
    * [[approxDistinct]] (3× the default 5% rsd — a drifting sketch fails
    * the gate long before a user would notice). Shared with the oracle. */
  val ApproxDistinctTol = 0.15

  /** Approximate distinct (HLL++) — the sketch value itself is
    * engine-specific, so the CHECKABLE output is the exact count (oracle-
    * computable) plus a `within_tol` CLAIM: |approx − exact| ≤
    * [[ApproxDistinctTol]] · exact. The oracle emits the same exact rows
    * with `within_tol = TRUE`, so a sketch that drifts out of its error
    * budget fails the hash gate — the sketch is gated, not just displayed.
    * ScalaTest additionally brackets the raw estimate.
    *
    * At 100 TB the sketch (fixed-size, mergeable, one pass) is the point;
    * the exact countDistinct alongside it is affordable here because the
    * gate runs at small SF — production would emit the sketch alone. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users")) <=
          lit(ApproxDistinctTol) * col("exact_users")).as("within_tol"))
      .orderBy(col("event_type"))

  /** Relative-error tolerance for [[approxPercentiles]]' sketch claim. The
    * GK sketch at accuracy 10000 bounds RANK error at n/10000; on the
    * smooth extendedprice distribution that is far inside 1% VALUE error. */
  val ApproxPctTol = 0.01

  /** Approximate percentiles (GK sketch) — same claim pattern as
    * [[approxDistinct]]: the checkable output is the EXACT percentiles
    * (`percentile` ≡ DuckDB `quantile_cont`, the q_percentiles contract)
    * plus `within_tol` = every sketch estimate within [[ApproxPctTol]]
    * relative error of its exact value. At 100 TB the sketch is the only
    * viable GLOBAL percentile (exact needs a full sort; the sketch is one
    * pass, mergeable across partitions) — here it is gated against the
    * exact values the small-SF oracle can compute. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)").as("aq"),
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("eq"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(col("eq").getItem(0), 4).as("p25"),
        round(col("eq").getItem(1), 4).as("p50"),
        round(col("eq").getItem(2), 4).as("p75"),
        col("n"),
        expr(s"forall(zip_with(aq, eq, (a, e) -> abs(a - e) <= $ApproxPctTol * abs(e)), x -> x)")
          .as("within_tol"))
      .orderBy(col("l_returnflag"))

  /** Ordered string aggregation per nation — spelled as
    * `concat_ws(sort_array(collect_list(...)))` rather than LISTAGG because
    * the sort makes the result independent of partition arrival order (the
    * only listagg that is reproducible on a cluster). */
  def stringAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.supplier.join(broadcast(t.nation),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        concat_ws(",", sort_array(collect_list(col("s_name")))).as("suppliers"))
      .orderBy(col("n_name"))
  }

  /** Distribution window functions: quartile bucket, percent_rank, cume_dist
    * of each order within its priority class. */
  def ntilePercent(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"), // DuckDB ntile is BIGINT
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderkey"))
  }

  /** Value-banded alternative to a GLOBAL `ntile(nBands)` (round-11
    * verdict #6 — the ntile family's documented single-task trade): band
    * bounds come from ONE percentile aggregate (nBands − 1 doubles,
    * broadcast back as a 1-row frame), and assignment is a stateless
    * per-row comparison — no unpartitioned window sort anywhere in the
    * plan, so the operator holds at any corpus size where ntile's global
    * sort funnels the stream through one task. `exact = false` (default,
    * the scale path) sizes bounds with `approx_percentile`'s GK sketch;
    * `exact = true` computes true percentiles (small/medium inputs).
    *
    * SEMANTICS DIFFER FROM ntile AT TIES, deliberately: ntile equalizes
    * COUNTS, splitting a run of EQUAL values across adjacent tiles by row
    * position (nondeterministic under reordering unless the sort key is
    * unique); value banding assigns every equal value to the SAME band,
    * so band populations go uneven exactly where ties or heavy skew live.
    * With distinct values and band count dividing the row count the two
    * agree; BandedNtile ties are pinned in RelationalQueriesSpec. Band k
    * (1-based) = 1 + #bounds strictly below the value. */
  def bandedNtile(df: DataFrame, valueCol: String, nBands: Int,
      outCol: String = "band", exact: Boolean = false): DataFrame = {
    require(nBands >= 2, s"nBands must be >= 2, got $nBands")
    // uniquify the internal bounds column against the input AND the output
    // name: a caller whose frame already carries `__bounds` (e.g. a
    // preserved intermediate of an earlier banding pass) would otherwise
    // hit an ambiguous-reference AnalysisException after the crossJoin —
    // and drop() would drop both. Compare case-insensitively (the default
    // resolver is case-insensitive, so `__BOUNDS` collides with
    // `__bounds`), and exclude outCol or the final drop would silently
    // delete the band column itself (round-12 review).
    val taken = (df.columns.toSeq :+ outCol).map(_.toLowerCase)
    val bCol = Iterator.from(0)
      .map(i => if (i == 0) "__bounds" else s"__bounds$i")
      .find(c => !taken.contains(c)).get
    val ps = (1 until nBands).map(k => k.toDouble / nBands)
      .mkString("array(", ", ", ")")
    val boundsAgg =
      if (exact) expr(s"percentile($valueCol, $ps)")
      else expr(s"approx_percentile($valueCol, $ps, 10000)")
    val bounds = df.agg(boundsAgg.cast("array<double>").as(bCol))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        expr(s"1L + aggregate($bCol, 0L, (acc, b) -> " +
          s"acc + CASE WHEN cast($valueCol AS double) > b THEN 1L ELSE 0L END)"))
      .drop(bCol)
  }

  /** Unpivot: lineitem measures → (measure, value) rows, then per-measure
    * stats — the wide→long reshape. Spark's native `unpivot`; the oracle
    * spells it as UNION ALL (portable ANSI). */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .unpivot(
        ids = Array(col("l_orderkey")),
        values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
      .orderBy(col("measure"))

  /** Value-based (RANGE) window frame — each order's trailing-30-day revenue
    * for the same customer: the frame bound is an ORDER-VALUE distance, not
    * a row count, which is the windowed shape rolling time-based features
    * need (rows-frames break the moment events are unevenly spaced). Sum in
    * DECIMAL so the frame's internal order can't move the double. Epoch
    * seconds as the range key — identical integer arithmetic in both
    * engines. */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_ts"))
      .rangeBetween(-RangeFrameSec, 0L)
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"),
        Out.epochSec(col("o_orderdate")).as("order_ts"), col("o_totalprice"))
      .withColumn("trailing30d_revenue",
        sum(col("o_totalprice").cast(Out.SumDecimal)).over(w).cast("double"))
      .withColumn("trailing30d_orders", count(lit(1)).over(w))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** The salted skew join driven through the ORACLE gate, not just a spec:
    * lineitem ⋈ orders salted 8 ways, then aggregated. Salting is pure
    * partitioning — the result must be bit-identical to the plain join the
    * oracle runs, and this query makes the driver prove it every round.
    * (The plan itself is asserted shuffle-shaped in SkewJoinSpec; here the
    * semantics are on trial.) Revenue sums in DECIMAL ([[Out.dsum]]) so the
    * 8-way salt's different partition order cannot move a double sum. */
  def skewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val l = t.lineitem.select(col("l_orderkey").as("okey"),
      col("l_linenumber"), col("l_extendedprice"))
    val o = t.orders.select(col("o_orderkey").as("okey"), col("o_orderstatus"))
    SkewJoin.saltedInnerJoin(l, o, Seq("okey"), col("l_linenumber"), n = 8)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Out.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  /** TPC-H Q3-shape shipping-priority query: top-`k` unshipped orders by
    * discounted revenue for one market segment — the canonical 3-table
    * join + aggregate + top-k pipeline (the only TPC-H classic the corpus
    * was still missing next to Q1).
    *
    * Shape at scale: all three filters land on their parquet scans BEFORE
    * any join (segment on customer, both date bounds pushed); customer is
    * the small side (one segment ≈ 1/5 of customers, each row just the
    * key) so AQE broadcasts it into the orders scan; the orders⋈lineitem
    * FK join shuffles on the order key once and the same key feeds the
    * groupBy — Catalyst reuses the partitioning, so the whole query is ONE
    * wide shuffle plus a TakeOrderedAndProject (per-partition heap of k,
    * never a global sort). Revenue in DECIMAL ([[tpch1Pricing]] rationale). */
  def tpch3TopK(spark: SparkSession, dir: String,
      segment: String = Tpch3Segment, cutoff: String = Tpch3Cutoff,
      k: Int = Tpch3K): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val t = Tables(spark, dir)
    val cut = lit(cutoff).cast("timestamp")
    val c = t.customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    val o = t.orders.filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val l = t.lineitem.filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val priceDec = col("l_extendedprice").cast(DecimalType(12, 2))
    val discF = (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(priceDec * discF).cast("double").as("revenue"))
      .select(col("l_orderkey"), Out.epochSec(col("o_orderdate")).as("order_ts"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)
  }

  /** Conditional aggregation — SQL's `FILTER (WHERE ...)` clause, spelled
    * `agg(when(cond, x))` in Spark: several differently-filtered measures
    * in ONE pass over the fact table, instead of one scan per condition.
    * All map-side partial aggregation; sums in DECIMAL (order-independent).
    * The `otherwise` is omitted deliberately: `when` without it yields NULL
    * for non-matching rows and both COUNT and SUM skip NULLs — exactly
    * FILTER semantics (a group with no matches sums to NULL, as in SQL). */
  def aggFilter(spark: SparkSession, dir: String): DataFrame = {
    val qDec = col("l_quantity").cast(Out.SumDecimal)
    val pDec = col("l_extendedprice").cast(Out.SumDecimal)
    val disc = col("l_discount") > 0.05
    val bulk = col("l_quantity") >= 25.0
    Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_all"),
        count(when(disc, lit(1))).as("n_disc"),
        sum(when(disc, qDec)).cast("double").as("qty_disc"),
        count(when(bulk, lit(1))).as("n_bulk"),
        sum(when(bulk, pDec)).cast("double").as("price_bulk"))
      .orderBy(col("l_returnflag"))
  }

  /** Ratio-to-report: each nation's share of its REGION's revenue — the
    * percent-of-total window every BI layer ships (`revenue / sum(revenue)
    * OVER (PARTITION BY region)`), here over the customer⋈orders rollup
    * with the dims broadcast.
    *
    * Shape at scale: the fact aggregates FIRST (one shuffle on the
    * customer key → nation rollup is metadata-sized), then the share
    * window runs over ≤ |nations| rows — the window never sees fact rows.
    * Aggregate-then-window is the difference between a metadata window and
    * a corpus re-sort; the share division happens once per output row on
    * exact decimal sums. */
  def ratioToReport(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dims = t.nation
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val perNation = t.orders
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice").cast(Out.SumDecimal)).as("revDec"))
    val w = Window.partitionBy(col("r_name"))
    perNation
      .select(col("r_name"), col("n_name"),
        col("revDec").cast("double").as("revenue"),
        round((col("revDec") / sum(col("revDec")).over(w)).cast("double"), 6)
          .as("region_share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** SCD-type-2 history build via gaps-and-islands: collapse each customer's
    * order-status sequence into contiguous runs ("islands") with
    * `[valid_from, valid_to)` effective ranges — the standard construction
    * of a slowly-changing dimension from an event log, and the one classic
    * windowing pattern the corpus still lacked (session_window is its
    * event-time cousin; this is the ordinal version).
    *
    * Three stages, all on the SAME partition key: change-flag via `lag`,
    * island id via running sum, per-island aggregate, then `lead` for the
    * exclusive upper bound. Catalyst plans ONE shuffle on `o_custkey` and
    * reuses the sort for every window — the plan a 100 TB dimension build
    * needs (each customer's history is a few rows; no per-key task
    * explosion because keys are many and small, the opposite regime of
    * [[graft.ops.PipelineQueries.tokenPacking]]'s 4-language case).
    * Ordering ties broken by `o_orderkey` in both engines. */
  def scd2Islands(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("o_custkey"))
      .orderBy(col("sec"), col("o_orderkey"))
    val islands = Window.partitionBy(col("o_custkey"))
      .orderBy(col("island"))
    Tables(spark, dir).orders
      .select(col("o_custkey"), col("o_orderstatus"),
        Out.epochSec(col("o_orderdate")).as("sec"), col("o_orderkey"))
      .withColumn("chg",
        when(lag(col("o_orderstatus"), 1).over(byKey) === col("o_orderstatus"), 0L)
          .otherwise(1L))
      .withColumn("island",
        sum(col("chg")).over(byKey.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy(col("o_custkey"), col("island"), col("o_orderstatus"))
      .agg(min(col("sec")).as("valid_from"), count(lit(1)).as("n_orders"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(islands))
      .select(col("o_custkey"), col("island"), col("o_orderstatus"),
        col("valid_from"), col("valid_to"), col("n_orders"))
      .orderBy(col("o_custkey"), col("island"))
  }

  /** TPC-H Q5-shape local-supplier volume: revenue per nation for orders in
    * one region and one year where the customer and the line's supplier sit
    * in the SAME nation — the canonical snowflake join (6 tables, the widest
    * join tree in the corpus).
    *
    * Shape at scale: region⋈nation collapses to a handful of rows and is
    * folded into supplier via an explicit `broadcast` (dims never shuffle a
    * fact); the filtered supplier side — key + nation only — broadcasts
    * into lineitem, so the ONLY wide shuffle is orders⋈lineitem on the
    * order key. The `c_nationkey = s_nationkey` correlation rides the
    * customer join as a second equi-predicate rather than a post-join
    * filter, so Catalyst keys the shuffle on `o_custkey` alone and applies
    * the nation match during the probe. Revenue in DECIMAL
    * ([[tpch1Pricing]] rationale: order-independent across partitionings). */
  def tpch5Volume(spark: SparkSession, dir: String,
      regionName: String = Tpch5Region, yearStart: String = Tpch5YearStart,
      yearEnd: String = Tpch5YearEnd): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val t = Tables(spark, dir)
    val natInRegion = t.nation
      .join(broadcast(t.region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t.supplier
      .join(broadcast(natInRegion), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val o = t.orders
      .filter(col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = t.lineitem.select(col("l_orderkey"), col("l_suppkey"),
      col("l_extendedprice"), col("l_discount"))
    val priceDec = col("l_extendedprice").cast(DecimalType(12, 2))
    val discF = (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(priceDec * discF).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q18-shape large-volume customers: orders whose total line
    * quantity exceeds `minQty`, joined back to order + customer detail,
    * top-`k` by order value.
    *
    * Shape at scale: the lineitem aggregate is map-side partial (quantity
    * sums combine per partition before the one shuffle on the order key),
    * and the HAVING filter collapses it to a near-empty key set — AQE sees
    * the tiny post-agg side and broadcasts it into both detail joins, so
    * neither orders nor customer re-shuffles for a handful of matches.
    * This semi-join-reduction shape (aggregate → filter → broadcast the
    * survivors) is how a 100 TB "needles" query avoids moving the
    * haystack. Quantity summed in DECIMAL (exact, order-independent);
    * top-k is TakeOrderedAndProject, never a global sort. */
  def tpch18BigOrders(spark: SparkSession, dir: String,
      minQty: Double = Tpch18MinQty, k: Int = Tpch18K): DataFrame = {
    val t = Tables(spark, dir)
    val bigOrders = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(Out.SumDecimal)).as("qtyDec"))
      .filter(col("qtyDec") > minQty)
      .select(col("l_orderkey"), col("qtyDec").cast("double").as("total_qty"))
    bigOrders
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        Out.epochSec(col("o_orderdate")).as("order_ts"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
  }

  /** Quarter window + lateness threshold for [[tpch4Priority]] (shared with
    * the oracle SQL by interpolation). */
  val Tpch4Start = "1996-01-01"
  val Tpch4End = "1996-04-01"
  val Tpch4LateDays = 60

  /** TPC-H Q4-shape order-priority check: how many orders per priority
    * class placed in one quarter had at least one line shipped more than
    * [[Tpch4LateDays]] days after the order date (the schema's analog of
    * Q4's commit-vs-receipt lateness — this lineitem has no commit/receipt
    * dates). The canonical EXISTS-correlated-subquery report.
    *
    * Shape at scale: the quarter filter lands on the orders parquet scan
    * (partition-prunable on a date-partitioned lake), EXISTS becomes a
    * LEFT SEMI join on the order key — one shuffle, short-circuiting on
    * the first matching line, never materializing the multiplicity — and
    * the per-priority count is a 5-row partial agg. The lateness predicate
    * rides the semi join as a residual condition on the already-matched
    * key, so no extra pass over lineitem. */
  def tpch4Priority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders
      .filter(col("o_orderdate") >= lit(Tpch4Start).cast("timestamp")
        && col("o_orderdate") < lit(Tpch4End).cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") >
            col("o_orderdate") + expr(s"INTERVAL $Tpch4LateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Top-k size for [[tpch10Returns]]. */
  val Tpch10K = 20

  /** TPC-H Q10-shape returned-item report: the customers who returned the
    * most revenue in one quarter, with their nation — the classic "who
    * should customer service call" 4-table join.
    *
    * Shape at scale: both selective filters (quarter on orders, return
    * flag on lineitem) push to their scans before any join; the
    * orders⋈lineitem FK join shuffles once on the order key, the customer
    * join re-shuffles the handful of surviving rows on the customer key
    * (AQE sees the post-filter sizes), and nation is a broadcast. Revenue
    * in DECIMAL ([[tpch1Pricing]] rationale); ties broken by customer key
    * so the top-k heap is deterministic. */
  def tpch10Returns(spark: SparkSession, dir: String,
      k: Int = Tpch10K): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val t = Tables(spark, dir)
    val o = t.orders
      .filter(col("o_orderdate") >= lit(Tpch4Start).cast("timestamp")
        && col("o_orderdate") < lit(Tpch4End).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = t.lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val priceDec = col("l_extendedprice").cast(DecimalType(12, 2))
    val discF = (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer.select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(priceDec * discF).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Market segment for [[bloomSemiJoin]]. */
  val BloomSegment = "BUILDING"

  /** Floor for the bloom sizing: below this many build keys the filter is
    * kilobytes either way and a tight estimate buys nothing. */
  val BloomMinItems = 10000L

  /** Bloom-prefiltered semi-join: revenue of orders whose customer is in
    * one market segment, with the fact side pre-filtered by a bloom filter
    * built over the dim side's keys BEFORE the exact semi join — the
    * explicit spelling of semi-join reduction (Spark's own
    * InjectRuntimeFilter bloom pair, surfaced as `graft_bloom_agg` /
    * `graft_bloom_contains`).
    *
    * Correctness does not depend on the bloom: it admits false positives
    * but never false negatives, and the exact semi join downstream removes
    * the false positives — so the result is identical to the plain semi
    * join the oracle runs, at any filter quality.
    *
    * Shape at scale: the dim keys aggregate into ONE serialized filter
    * (map-side partial merge — TypedImperativeAggregate), evaluated once
    * as a scalar subquery and inlined into the fact scan's filter;
    * non-matching fact rows die at the scan (codegen'd XXH64 probe, no
    * shuffle paid), so the exact semi join shuffles only near-matches. At a 0.1% match rate that is a
    * ~1000× shuffle reduction the plain semi join cannot get. The explicit
    * form (vs the optimizer's opportunistic injection) survives plan shapes
    * the heuristic declines — multi-stage pipelines, reused dims, AQE
    * thresholds. */
  def bloomSemiJoin(spark: SparkSession, dir: String,
      segment: String = BloomSegment): DataFrame = {
    val t = Tables(spark, dir)
    // Size the filter from the TRUE build-side count (guide rule:
    // expectedNumItems >= the real key count, or the fpp degrades toward
    // all-pass and the prefilter silently stops filtering). The count is
    // one narrow scan of the dim — the documented price of bloom
    // prefiltering (the small side is read twice); the round-17 fixed
    // 1 M-item constant was oversized 300× at sf0.1 (a ~1 MB broadcast for
    // 3 k keys) and would be UNDERSIZED past ~1000× corpus growth, which
    // is the failure direction that defeats the filter's purpose.
    val dimCount = t.customer
      .filter(col("c_mktsegment") === segment).count()
    val estItems = math.max(dimCount, BloomMinItems)
    // might_contain accepts the filter only as a constant or scalar
    // subquery (the InjectRuntimeFilter contract — the filter must be a
    // build-once broadcast, never a per-row attribute), so the probe is
    // spelled in SQL with the aggregate as a scalar subquery.
    t.customer.createOrReplaceTempView("graft_bloom_cust")
    t.orders.createOrReplaceTempView("graft_bloom_orders")
    spark.sql(
      s"""WITH dim AS (SELECT c_custkey FROM graft_bloom_cust
         |            WHERE c_mktsegment = '$segment')
         |SELECT o_orderstatus, count(*) AS n,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
         |FROM graft_bloom_orders
         |WHERE graft_bloom_contains(
         |    (SELECT graft_bloom_agg(xxhash64(c_custkey), ${estItems}L)
         |     FROM dim),
         |    xxhash64(o_custkey))
         |  AND o_custkey IN (SELECT c_custkey FROM dim)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** Snapshot cutoffs for [[snapshotDiff]] (shared with the oracle SQL). */
  val SnapOldCutoff = "1997-01-01"
  val SnapNewCutoff = "1998-01-01"

  /** Snapshot reconciliation (CDC-style table diff): per-customer order
    * count + exact revenue at two snapshot cutoffs, full-outer joined, rows
    * whose status changed — the "what moved between yesterday's table and
    * today's" audit every warehouse runs after a load. Statuses: `added`
    * (key only in the new snapshot), `removed` (only in the old — cannot
    * occur on this append-only source, but the arm is real: a snapshot pair
    * from a mutable table exercises it), `changed` (both present, any
    * aggregate differs). `same` rows are filtered — the diff is the
    * exception report, so its size tracks the CHANGE volume, not the table.
    *
    * Shape at scale: each snapshot is one partial-agg shuffle on the key;
    * the full-outer diff join reuses that same key partitioning (no third
    * exchange). The aggregates use the decimal-exact sum discipline, so
    * "changed" can compare doubles for exact equality — both engines
    * compute the identical value or the row genuinely changed. */
  /** The diff proper over two keyed snapshot aggregates — columns
    * (cust, {old|new}_n, {old|new}_total). Split out so a spec can feed
    * synthetic snapshots and exercise the `removed` arm the append-only
    * orders source never produces. */
  def diffSnapshots(oldSnap: DataFrame, newSnap: DataFrame): DataFrame =
    oldSnap.join(newSnap, Seq("cust"), "full_outer")
      .withColumn("status",
        when(col("old_n").isNull, lit("added"))
          .when(col("new_n").isNull, lit("removed"))
          .when(col("old_n") =!= col("new_n") ||
            col("old_total") =!= col("new_total"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .select(col("cust"), col("status"), col("old_n"), col("new_n"),
        col("old_total"), col("new_total"))
      .orderBy(col("cust"))

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // NULL keys excluded on both sides: a NULL-keyed group never matches in
    // the full-outer join, so it would surface as a NULL added + NULL
    // removed pair whose sort position differs between engines (the
    // Out.scala nullable-ORDER-BY contract)
    def snap(cutoff: String, pre: String) = t.orders
      .filter(col("o_custkey").isNotNull &&
        col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .groupBy(col("o_custkey").as("cust"))
      .agg(count(lit(1)).as(s"${pre}_n"),
        Out.dsum(col("o_totalprice")).as(s"${pre}_total"))
    diffSnapshots(snap(SnapOldCutoff, "old"), snap(SnapNewCutoff, "new"))
  }

  /** Basket-size guard for the co-purchase self-join: the pair fan-out per
    * order is C(parts, 2), so one degenerate mega-basket (a crawler
    * session, a bulk import) turns the join quadratic. Orders above the
    * cap abort loudly — the resolution (drop or sample huge baskets) is a
    * data-owner decision, not one the engine should take silently. */
  val CoPurchaseMaxBasket = 1000L

  /** Top co-purchased part pairs: distinct parts sharing an order, paired
    * (p1 < p2), counted, top-20 by support — market-basket affinity, the
    * "frequently bought together" shape.
    *
    * Round-18 rework (from a plan audit): the old spelling self-joined a
    * `distinct + count-over-window` subplan with itself — Spark re-executes
    * an uncached subplan per reference, so the scan, the distinct exchange,
    * and the window sort all ran TWICE, plus a broadcast of one whole side
    * (plans/r18/q_copurchase_before.txt: 2 scans, 2 windows, 5 exchanges).
    * Baskets are the per-order grain, so one `collect_set(pk)` groupBy
    * gives the distinct basket AND its size in a single partial-aggregated
    * exchange, the [[CoPurchaseMaxBasket]] tripwire reads `size(basket)`
    * directly, and the (p1 < p2) pairs expand IN-ROW from the array — the
    * same bucket-pair expansion the dedup family uses, bounded by
    * C(cap, 2) per order. After: 2 exchanges, no window, no join, one scan.
    *
    * Shape at scale: one shuffle keyed by order (map-side partial
    * collect_set — lineitem files cluster by order key, so the partial
    * collapses ~lines-per-order to 1), then the RAW pair rows shuffle on an
    * explicit hash(p1) repartition and aggregate ABOVE it — the
    * [[graft.ops.DedupQueries]] counting-join lesson applied here after a
    * 100× stage profile of the first spelling: co-purchase pairs are
    * near-unique (each occurs ~1.3×), so a map-side pair partial agg
    * collapsed nothing while its hash map spilled 13.3 GB, and the final
    * agg at core-count width held ~8 M entries/task for another 11.4 GB of
    * spill. Raw pairs cost the same shuffle bytes with no map, and the
    * explicit width (4× cores past the [[Tables.bigInputs]] gate;
    * REPARTITION_BY_NUM is AQE-coalesce-exempt) bounds the above-exchange
    * aggregate's per-task state. hash(p1) satisfies the aggregate's
    * clustering (equal pairs share p1), so no second exchange appears.
    * Fan-out per order is C(basket, 2) ≤ C(cap, 2) (TPC-H baskets ≤ 7
    * lines → ≤ 21 pairs) — linear in orders, never quadratic in lineitems,
    * and the tripwire enforces that boundedness instead of assuming it.
    * Top-20 compiles to TakeOrderedAndProject over the aggregated pair
    * counts — no global sort. */
  def coPurchase(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables(spark, dir).lineitem
      .where(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(collect_set(col("l_partkey")).as("pks"))
      .withColumn("pks",
        when(size(col("pks")) > CoPurchaseMaxBasket, raise_error(concat(
          lit(s"coPurchase: basket exceeds $CoPurchaseMaxBasket parts for order "),
          col("ok")))).otherwise(col("pks")))
    // Pair expansion via the codegen'd [[graft.functions.PairsExpand]]
    // kernel (round 19) — same nested-loop semantics as the HOF spelling it
    // replaces, compiled instead of interpreted per pair.
    val pairs = baskets
      .select(explode(expr("graft_pairs(pks)")).as("p"))
      .select(col("p.a").as("p1"), col("p.b").as("p2"))
    // Raw-pair repartition only past the scale gate (the simhash `pinned`
    // precedent): at sf0.1 the extra exchange costs ~3× the key's CPU for
    // nothing (the pair stream is 3 M rows and the default agg exchange
    // doesn't spill), while at 100× it is the difference between 24 GB of
    // aggregate-map spill and zero.
    val shuffled =
      if (Tables(spark, dir).bigInputs())
        pairs.repartition(spark.sparkContext.defaultParallelism * 4, col("p1"))
      else pairs
    shuffled
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p1"), col("p2"))
      .limit(20)
  }

  /** Supply-concentration index per supplier nation: the Herfindahl–
    * Hirschman index of line-item volume across the nation's suppliers
    * (HHI = Σ share², 1/n for perfect balance → 1.0 for a monopoly), with
    * the top supplier's share. The market-structure metric a sourcing-risk
    * review reads. Exactness trick: with integer per-supplier counts,
    * HHI = (Σ nᵢ²) / N² — all-integer numerator and denominator, ONE double
    * division at the end, so no order-dependent double summation exists
    * anywhere. Two partial-agg shuffles (supplier grain, then nation
    * grain) + a broadcast supplier-dim join. */
  def supplierConcentration(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perSupp = t.lineitem
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .join(broadcast(t.supplier.select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey"))), Seq("l_suppkey"))
    perSupp
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("n")).as("n_lines"),
        sum(col("n") * col("n")).as("sq"),
        max(col("n")).as("top_n"))
      .select(col("nationkey"), col("n_suppliers"), col("n_lines"),
        // double×double denominator (matches the oracle and cannot
        // overflow the way a long×long product would at 100 TB counts)
        round(col("sq").cast("double") /
          (col("n_lines").cast("double") * col("n_lines").cast("double")), 6)
          .as("hhi"),
        round(col("top_n").cast("double") / col("n_lines"), 6)
          .as("top_share"))
      .orderBy(col("nationkey"))
  }

  /** Order-size distribution: how many orders have k line items — the
    * basket-size histogram (k is bounded by TPC-H construction, so the
    * output is a handful of rows). Two partial-agg shuffles: order grain,
    * then size grain. */
  def orderSizeDist(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      .groupBy(col("n_items"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_items"))

  /** Order-to-ship latency profile per order priority: exact p50/p90/max
    * of `l_shipdate − o_orderdate` in days, with line counts — the
    * fulfillment-SLA cut of the order pipeline (does priority actually buy
    * faster shipping?). Latencies are exact integer day differences; the
    * join is the standard orders⋈lineitem equi-join (AQE handles the
    * shuffle), and the percentile is a partition-local sort-agg per
    * priority — the [[StatsQueries.percentiles]] regime on a derived
    * measure. */
  def shipLatency(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .select(col("l_orderkey"),
        (Out.epochSec(col("l_shipdate")) / 86400).cast("long").as("ship_day"))
      .join(t.orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority"),
        (Out.epochSec(col("o_orderdate")) / 86400).cast("long").as("order_day")),
        Seq("l_orderkey"))
      .select(col("o_orderpriority"),
        (col("ship_day") - col("order_day")).as("lat_days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(expr("percentile(lat_days, 0.5)"), 4).as("lat_p50"),
        round(expr("percentile(lat_days, 0.9)"), 4).as("lat_p90"),
        max(col("lat_days")).as("lat_max"))
      .orderBy(col("o_orderpriority"))
  }

  /** Price-bucket width (cents) for the skyline's two-pass prefix max.
    * Shared with the oracle SQL. */
  val SkylineBucketCents = 100000L

  /** 2-D skyline (Pareto frontier) of orders under (minimize totalprice,
    * maximize orderdate): an order survives iff NO other order is strictly
    * cheaper AND strictly later — the "cheapest for its recency" frontier,
    * the classic multi-criteria shortlist query.
    *
    * Distributed shape — the textbook sort-based skyline needs a GLOBAL
    * running max over the price order, which would put every distinct price
    * in one window task. Instead the same two-pass prefix trick as
    * [[graft.ops.PipelineQueries.tokenPacking]]: (1) per price-BUCKET max
    * date — a partial-agg shuffle; (2) the running max across the ordered
    * buckets is a METADATA-scale window (≤ price-domain/width rows)
    * broadcast back; (3) within each bucket, a RANGE-frame window over
    * integer cents supplies the strictly-cheaper-in-bucket max. dominated ⟺
    * max(prior-bucket max, in-bucket strictly-cheaper max) > date. Every
    * data-sized stage is keyed by bucket; nothing data-sized crosses a
    * single task.
    *
    * Determinism: prices compared as integer CENTS — ROUND-to-nearest of
    * price×100, same spelling in both engines and the brute-force spec.
    * Round, not trunc: the corpus's 2dp prices land within 1e-9 of an
    * integer after ×100, so nearest recovers the exact cent, where trunc
    * mapped e.g. 19.99 (double 1998.999…) and 19.98 (1998.0) both to 1998
    * and could let a dominated order survive (round-6 advice). Dates are
    * epoch seconds; strict inequalities only, so ties never depend on
    * order. */
  def skylineOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_totalprice"),
        Out.epochSec(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("bucket", (col("cents") / SkylineBucketCents).cast("long"))
    val bucketMax = o.groupBy(col("bucket")).agg(max(col("d")).as("bmax"))
      .withColumn("bprev",
        max(col("bmax")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("cents"))
      .rangeBetween(Window.unboundedPreceding, -1)
    o.join(broadcast(bucketMax.select(col("bucket"), col("bprev"))), Seq("bucket"))
      .withColumn("cheaperMax",
        greatest(coalesce(max(col("d")).over(inBucket), lit(Long.MinValue)),
          coalesce(col("bprev"), lit(Long.MinValue))))
      .filter(col("cheaperMax") <= col("d"))
      .select(col("o_orderkey"), col("o_totalprice"), col("d").as("d_sec"))
      .orderBy(col("o_orderkey"))
  }
}
