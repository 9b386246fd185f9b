package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational analytics over the driver's TPC-H-ish star schema —
  * the engine's general-query surface beyond reference parity (the
  * reference has no joins/windows/top-k: SURVEY §2.2 "not present";
  * these are the SURVEY §7 phase-7 extensions).
  *
  * Scale design notes (100 TB posture):
  *  - Dimension tables (region 5, nation 25, supplier 100·sf,
  *    customer 1500·sf) are explicitly `broadcast()` so fact-table
  *    joins never shuffle lineitem/orders on the dim key.
  *  - Money is summed in integer CENTS (`round(x*100)` → bigint):
  *    bit-exact across engines and immune to float summation-order
  *    differences, and faster than decimal at the same fidelity.
  *  - Filters sit directly on scan columns so Catalyst pushes them
  *    into the parquet reader (PushedFilters); aggregates are
  *    algebraic → map-side partial aggregation everywhere.
  *  - Top-k uses order+limit which Spark executes as per-partition
  *    TakeOrdered (no global sort shuffle).
  */
object RelQueries {

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** round(x*100) as bigint — exact cents, identical in DuckDB. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Overflow-CHECKED bigint sum: accumulates in decimal(38,0) — which
    * cannot overflow for any physical row count times cents-scale
    * values — and raises instead of wrapping if the total leaves long
    * range. Same output schema (BIGINT) and same values as `sum(long)`
    * whenever that sum is in range, so oracles are unaffected.
    *
    * WHEN TO USE: Spark 4's ANSI-on default already makes plain
    * `sum(long)` throw on overflow (codegen addExact), at zero cost —
    * so the hot aggregates keep plain sums and rely on the session
    * default to fail loudly rather than wrap. This operator is for
    * (a) sessions running `spark.sql.ansi.enabled=false`, where plain
    * sums DO wrap silently, and (b) totals that only exceed long range
    * transiently (decimal accumulation fails only if the FINAL total
    * does). Measured 2.2× slower than the plain sum on Q1 at sf0.1 —
    * a deliberate opt-in, not the default. */
  private[queries] def sumLongChecked(c: Column): Column = {
    val d = sum(c.cast("decimal(38,0)"))
    when(d.isNull, lit(null).cast("long"))
      .when(d > lit(Long.MaxValue) || d < lit(Long.MinValue),
        raise_error(concat(lit("bigint sum overflow: "), d.cast("string")))
          .cast("long"))
      .otherwise(d.cast("long"))
  }

  /** Q1-style pricing summary: one pass over lineitem, partial+final
    * hash aggregation, no joins. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      // plain long sums: overflow-checked (fail-loud) under the ANSI-on
      // session default; see sumLongChecked for the ANSI-off variant
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
        count(lit(1)).as("count_order"))

  /** Q3-style shipping priority: broadcast customer, shuffle join
    * orders⋈lineitem on orderkey, top-10 by revenue. */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-style local-supplier volume: all dims broadcast; the only
    * shuffle is lineitem⋈orders on orderkey. */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val region = t(spark, sfDir, "region").filter(col("r_name") === "ASIA")
    val nation = t(spark, sfDir, "nation")
    val cust = t(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val supp = t(spark, sfDir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey") &&
        supp("s_nationkey") === cust("c_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
  }

  /** Top-k without a global sort: TakeOrderedAndProject. */
  def topOrders(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(100)

  /** Window function: first 3 orders per customer by date. One shuffle
    * on custkey; rank computed within partitions. */
  def firstOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long").as("rn"))
  }

  /** Running per-customer order total: the window-cumsum shape (one
    * shuffle on custkey; unique (date, orderkey) order makes the
    * default RANGE frame identical to ROWS, so the result is
    * engine-exact). */
  def runningCustomerTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("c"))
      .withColumn("run_cents", sum(col("c")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("run_cents"))
  }

  /** Day-over-day delta of event counts per type (lag window over the
    * daily rollup — tiny input, one exchange on type). */
  def eventsDailyDelta(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    eventsDaily(spark, sfDir)
      .select(col("day"), col("event_type"), col("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(col("day"), col("event_type"), col("n"),
        (col("n") - coalesce(col("prev_n"), lit(0L))).as("delta"))
  }

  /** Daily event rollup: count + exact cents sum per (day, type).
    * Event time goes through [[graft.sources.EventTime]], which adapts
    * to whatever physical encoding the table carries (int64 nanos,
    * TIMESTAMP, TIMESTAMP_NTZ) — all inside codegen. Day is emitted as
    * an ISO string so the hash compare is engine-neutral. */
  def eventsDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    ev.groupBy(graft.sources.EventTime.tsDay(ev).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
  }

  /** Exact distinct users per event type (shuffle on type after
    * map-side partial distinct) + approx variant for the 100 TB path
    * in the same result row for comparability. */
  def distinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** HLL-sketch distinct counts — the 100 TB path (constant memory per
    * group vs a distinct-set shuffle). No SQL oracle (sketch estimates
    * are engine-specific); RelQueriesSpec pins the error band. */
  def approxDistinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users_approx"))

  /** ROLLUP pricing totals: per (flag, status), per flag, grand total —
    * null grouping slots coalesced to 'ALL' for engine-neutral output. */
  def pricingRollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))

  /** CUBE grouping sets: order counts and value by priority × year,
    * all four grouping combinations in one pass (Spark expands the
    * grouping sets before the partial aggregate, so the fact table is
    * still read once). grouping() disambiguates a NULL dimension value
    * from a cube subtotal row — coalesce alone can't. */
  def orderPriorityCube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "orders")
      .select(col("o_orderpriority"), year(col("o_orderdate")).as("o_year"),
        cents(col("o_totalprice")).as("c"))
      .cube(col("o_orderpriority"), col("o_year"))
      // grouping() is only resolvable inside the cube's own Aggregate,
      // so the subtotal markers are emitted here and mapped after
      .agg(count(lit(1)).as("n"), sum(col("c")).as("total_cents"),
        grouping(col("o_orderpriority")).as("gp"), grouping(col("o_year")).as("gy"))
      .select(
        when(col("gp") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        when(col("gy") === 1, lit(-1L)).otherwise(col("o_year").cast("long")).as("o_year"),
        col("n"), col("total_cents"))

  /** Changelog compaction (SCD-1 snapshot): apply an ordered upsert/
    * delete log and keep each key's latest surviving row. events stands
    * in as the changelog — key = user_id, version = event_id, 'error'
    * = delete, anything else upserts the event's value. max_by inside
    * a hash aggregate, NOT a row_number window: the aggregate gets
    * map-side partial combine (each partition reduces to one candidate
    * per key before the shuffle), where a window must shuffle + sort
    * every changelog row. */
  def changelogSnapshot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id").as("version"),
        (col("event_type") === "error").as("is_delete"),
        cents(col("value")).as("value_cents"))
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("version"), col("is_delete"), col("value_cents")),
        col("version")).as("last"))
      .filter(!col("last.is_delete"))
      .select(col("user_id"), col("last.version").as("version"),
        col("last.value_cents").as("value_cents"))

  /** Semi-structured extraction: `events.props` is a JSON property
    * bag; the numeric payload comes out with a codegen'd JSON-path
    * expression (`get_json_object` — per-row parse, map-only, no
    * UDF) and aggregates per event type. This is schema-on-read for
    * property bags; at 100 TB the right long-term move is promoting
    * hot keys to real columns at ingest, and this aggregate is
    * exactly the audit (coverage + range per key) that decides which
    * keys earn promotion. */
  def jsonPropsStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** SCD2 (slowly-changing-dimension type 2) history from the same
    * change log [[changelogSnapshot]] collapses: every change becomes
    * a VERSIONED dimension row with its validity window
    * [version, next-version), `valid_to = -1` for the open edge.
    * Deletes keep their row (flagged) so the history is complete —
    * `is_current` marks the one live version per surviving key.
    * One window pass partitioned by user_id — a high-cardinality
    * partition key, so the shuffle spreads; nothing global. */
  def scd2History(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id").as("version"),
        (col("event_type") === "error").cast("int").as("is_delete"),
        cents(col("value")).as("value_cents"))
      .withColumn("valid_to", coalesce(lead(col("version"), 1).over(w), lit(-1L)))
      .withColumn("is_current",
        (col("valid_to") === -1L && col("is_delete") === 0).cast("int"))
  }

  /** Pure range join (no equi key): event values vs overlapping price
    * bands, via [[graft.operators.RangeJoin.binned]] — a hash join on
    * bin ids instead of the O(n·m) nested loop Spark would otherwise
    * plan for an inequality-only condition. */
  def valueBandCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val bands = spark.range(20).select(col("id").as("band_id"),
      (col("id") * 2500L).as("lo"), (col("id") * 2500L + 5000L).as("hi"))
    val pts = t(spark, sfDir, "events").select(cents(col("value")).as("cents"))
    graft.operators.RangeJoin.binned(pts, "cents", bands, "lo", "hi", binWidth = 2500L)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
  }

  /** Anti join: customers that never ordered (left_anti — no fact
    * shuffle when the dim side is the probe side and orders is keyed). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "customer").select(col("c_custkey"))
      .join(t(spark, sfDir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")

  /** Set operation: customers active in 1996 but not 1997 (EXCEPT). */
  def lapsedCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    def active(year: Int) = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    active(1996).except(active(1997))
  }

  /** Semi join (TPC-H Q4 shape): order-priority counts over orders
    * having at least one "late" lineitem (shipped > 90 days after the
    * order date). left_semi — the fact scan is filtered, never
    * duplicated by the 1:N join. */
  def latePriorityCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val late = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(late,
        ord("o_orderkey") === late("l_orderkey") &&
          late("l_shipdate") > date_add(ord("o_orderdate"), 90), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Discrete per-group quantiles (p25/p50/p75 as the element at
    * rank ceil(q·n)) — engine-exact, same row_number machinery (and
    * same LOW-CARDINALITY PARTITION BOUND) as [[medianValue]]; the
    * 100 TB path is [[valueQuantilesApprox]]. */
  def valueQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents"), col("event_id"))
    // one window pass; the quantile fan-out is an explode over the row,
    // NOT a 3-branch union that would re-execute the ranked subplan
    t(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"), cents(col("value")).as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("q", explode(array(lit(25L), lit(50L), lit(75L))))
      .filter(col("rn") === expr("cast(ceil(n * q / 100.0) as bigint)"))
      .select(col("event_type"), col("q"), col("cents"))
  }

  /** Set operation: customers active in BOTH 1996 and 1997 (INTERSECT). */
  def retainedCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    def active(year: Int) = t(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    active(1996).intersect(active(1997))
  }

  /** Orders priced above their customer's average — the correlated-
    * aggregate pattern, computed as one window pass. The comparison is
    * integer cross-multiplication (price·n > Σprices in cents): a
    * float average would make boundary rows engine-dependent. */
  def aboveAverageOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
    t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("c"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("c")).over(w))
      .filter(col("c") * col("n") > col("s"))
      .select(col("o_orderkey"), col("o_custkey"))
  }

  /** Ordered funnel: users who signed up, then (strictly later)
    * clicked, then purchased. One pass: per-user min event time per
    * stage (conditional min), then integer µs comparisons — no joins,
    * no floats. */
  def signupFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    ev.select(col("user_id"), graft.sources.EventTime.tsUs(ev).as("us"),
        col("event_type"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("us"))).as("t_signup"),
        min(when(col("event_type") === "click", col("us"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("us"))).as("t_purchase"))
      .agg(
        count(col("t_signup")).as("n_signup"),
        count(when(col("t_click") > col("t_signup"), lit(1))).as("n_signup_click"),
        count(when(col("t_click") > col("t_signup") &&
          col("t_purchase") > col("t_click"), lit(1))).as("n_full_funnel"))
  }

  /** Full outer join: per-nation customer vs supplier presence —
    * nations may have either, both, or neither side. */
  def nationCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = t(spark, sfDir, "customer")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val supp = t(spark, sfDir, "supplier")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    cust.join(supp, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  /** Pivot: per-user-decile event counts spread across event types
    * (conditional aggregation — one pass, one shuffle on the decile). */
  def eventTypePivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(pmod(col("user_id"), lit(10)).as("user_decile"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** Gap-based sessionization of the event stream: a session breaks
    * after 30 min of user inactivity. session index = running count of
    * gap-breaks per user (one shuffle on user_id; windows run inside
    * the partition). Integer outputs only. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val raw = t(spark, sfDir, "events")
    val ev = raw
      .select(col("user_id"), graft.sources.EventTime.tsUs(raw).as("us"),
        col("event_id"))
    val gapMarked = ev
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("brk",
        (col("prev_us").isNull || col("us") - col("prev_us") > lit(30L * 60 * 1000000)).cast("long"))
      .withColumn("session_idx", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    gapMarked
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
        max(col("us")).as("end_us"))
  }

  /** Discrete per-group median (lower middle element) via row_number —
    * deterministic and identical across engines, unlike interpolated /
    * sketched quantiles.
    *
    * SCALE BOUND: `Window.partitionBy(event_type)` over a ~5-value key
    * funnels the whole fact table onto ~5 reduce tasks, each sorting
    * and buffering N/5 rows — exact and oracle-checkable, but only
    * viable while a single group's rows fit one task. The 100 TB path
    * is [[medianValueApprox]] (mergeable sketch, no per-group sort). */
  def medianValue(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents"), col("event_id"))
    t(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"), cents(col("value")).as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("cents").as("median_cents"))
  }

  /** APPROXIMATE per-group median — the scale path for [[medianValue]]:
    * `percentile_approx` is a mergeable KLL-style sketch aggregate, so
    * the plan is one hash aggregation with map-side partials — each
    * task folds its rows into a constant-size sketch and only sketches
    * cross the shuffle. A 5-value grouping key costs 5 sketch merges,
    * not 5 tasks × N/5 buffered-and-sorted rows. `accuracy` bounds the
    * rank error at n/accuracy. Rows-only gate (sketch internals are
    * engine-specific); RelQueriesSpec bounds the achieved rank error
    * against the exact operator. */
  def medianValueApprox(spark: SparkSession, sfDir: String,
      accuracy: Int = 10000): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_type"), cents(col("value")).as("cents"))
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("cents"), lit(0.5), lit(accuracy))
        .as("median_cents"))

  /** APPROXIMATE per-group p25/p50/p75 — the scale path for
    * [[valueQuantiles]]; one sketch per group serves all three ranks
    * (same output schema as the exact operator). */
  def valueQuantilesApprox(spark: SparkSession, sfDir: String,
      accuracy: Int = 10000): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_type"), cents(col("value")).as("cents"))
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("cents"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("qs"))
      .select(col("event_type"), posexplode(col("qs")).as(Seq("pos", "cents")))
      .select(col("event_type"),
        ((col("pos") + 1) * 25).cast("long").as("q"), col("cents"))

  /** The per-group (event_type, cents) VALUE histogram every exact
    * histogram-selection operator and banded gate derives from — one
    * hash aggregation with map-side partials; output size is bounded
    * by the value domain, not the fact-table row count. */
  private def centsHistogram(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_type"), cents(col("value")).as("cents"))
      .groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("c"))

  /** Median selection over a [[centsHistogram]] frame: the bucket whose
    * cumulative count first reaches rank (n+1) div 2 — the single
    * definition the hist operator AND the banded gate share, so the
    * selection boundary can never silently diverge between them. */
  private def histMedianSelect(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    hist
      .withColumn("cum", sum(col("c")).over(byVal))
      .withColumn("r", expr("(sum(c) over (partition by event_type) + 1) div 2"))
      .filter(col("cum") - col("c") < col("r") && col("r") <= col("cum"))
      .select(col("event_type"), col("cents").as("median_cents"))
  }

  /** p25/p50/p75 selection over a [[centsHistogram]] frame (rank
    * ceil(n·q/100); quantile fan-out by explode) — shared like
    * [[histMedianSelect]]. */
  private def histQuantilesSelect(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byVal = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    hist
      .withColumn("cum", sum(col("c")).over(byVal))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("event_type"))))
      .withColumn("q", explode(array(lit(25L), lit(50L), lit(75L))))
      .withColumn("r", expr("cast(ceil(n * q / 100.0) as bigint)"))
      .filter(col("cum") - col("c") < col("r") && col("r") <= col("cum"))
      .select(col("event_type"), col("q"), col("cents"))
  }

  /** Rank of each approx value inside its group's histogram: n = group
    * size, rank_of = rows with cents ≤ the approx value. `joinKeys`
    * matches histogram rows to approx rows (the histogram's group key);
    * `groupKeys` may add approx-side columns (e.g. the quantile q, so
    * each quantile gets its own rank). The approx frame is tiny (one
    * row per group/quantile) → broadcast. */
  private def rankOfApprox(hist: DataFrame, approx: DataFrame,
      joinKeys: Seq[String], groupKeys: Seq[String]): DataFrame =
    hist.join(broadcast(approx), joinKeys)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("c")).as("n"),
        sum(when(col("cents") <= col("approx_cents"), col("c"))
          .otherwise(lit(0L))).as("rank_of"),
        // size of the approx value's tie run — the verdict must accept
        // ANY rank inside the run (see bandVerdict)
        sum(when(col("cents") === col("approx_cents"), col("c"))
          .otherwise(lit(0L))).as("cnt_of"))

  /** Band verdict over a [[rankOfApprox]] frame (columns `n`,
    * `rank_of`, `cnt_of`): TRUE iff the approx value's FULL rank
    * interval [rank_of − cnt_of + 1, rank_of] intersects
    * [target − band, target + band], band = max(1, n/1000). Checking
    * only the interval's upper rank would spuriously fail a CORRECT
    * sketch on tie-heavy data — exactly the bounded-domain
    * distributions the histogram path targets: a modal value covering
    * >0.1% of a group that CONTAINS the true median has its upper rank
    * outside the band even when the sketch returned the exact median.
    * Interval intersection = nearest-edge distance ≤ band. */
  private[queries] def bandVerdict(target: Column): Column = {
    val band = greatest(lit(1.0), col("n") / lit(1000.0))
    (col("rank_of") - col("cnt_of") + lit(1) <= target + band) &&
      (target - band <= col("rank_of"))
  }

  /** EXACT distributed median via a two-pass selection — the third
    * point on the median trade-off surface: [[medianValue]] is exact
    * but buffers N/5 rows per task; [[medianValueApprox]] scales but
    * estimates; this is exact AND scale-safe whenever the VALUE DOMAIN
    * is bounded. Pass 1 collapses the fact table to [[centsHistogram]]
    * (hash aggregation, map-side partials); pass 2 walks the
    * histogram's cumulative counts to the bucket containing rank
    * (n+1)/2. The window runs over DISTINCT VALUES per group — for
    * cents-scale metrics thousands of rows, not billions — so the
    * low-cardinality partition bound moves from O(N/groups) to
    * O(domain). Same output as [[medianValue]], so it shares the
    * exact hash oracle. */
  def medianValueHist(spark: SparkSession, sfDir: String): DataFrame =
    histMedianSelect(centsHistogram(spark, sfDir))

  /** Exact distributed p25/p50/p75 over the same per-group histogram
    * (one window pass, quantile fan-out by explode) — shares
    * [[valueQuantiles]]' hash oracle. */
  def valueQuantilesHist(spark: SparkSession, sfDir: String): DataFrame =
    histQuantilesSelect(centsHistogram(spark, sfDir))

  /** BANDED gate for [[medianValueApprox]] — makes the sketch's error
    * contract driver-checkable instead of rows-only. Emits the EXACT
    * median (oracle-derivable) plus a `within_band` verdict: the rank
    * of the approx value inside its group must sit within
    * max(1, n/1000) of the true median rank — 10× slack over
    * percentile_approx's n/accuracy guarantee (accuracy=10000), same
    * band RelQueriesSpec pins. The oracle emits the exact twin and a
    * literal TRUE, so a sketch that leaves the band breaks the hash.
    * Scale posture: the verdict machinery is the same bounded-domain
    * histogram as [[medianValueHist]] plus a 5-row broadcast of the
    * sketch output — no per-group row sort anywhere. */
  def medianApproxBanded(spark: SparkSession, sfDir: String,
      accuracy: Int = 10000): DataFrame = {
    // the exact branch and the rank-of-approx branch both consume the
    // histogram; materialize it once (domain-bounded, small) so the
    // fact table is scanned twice total (hist + sketch), not three times
    val hist = centsHistogram(spark, sfDir).localCheckpoint()
    val approx = medianValueApprox(spark, sfDir, accuracy)
      .withColumnRenamed("median_cents", "approx_cents")
    val ranked = rankOfApprox(hist, approx, Seq("event_type"), Seq("event_type"))
    histMedianSelect(hist).join(broadcast(ranked), Seq("event_type"))
      .select(col("event_type"), col("median_cents"),
        bandVerdict(col("n") / lit(2.0)).as("within_band"))
  }

  /** BANDED gate for [[valueQuantilesApprox]]: exact p25/p50/p75 plus
    * a per-rank `within_band` verdict under the same rank band as
    * [[medianApproxBanded]]. */
  def quantilesApproxBanded(spark: SparkSession, sfDir: String,
      accuracy: Int = 10000): DataFrame = {
    // shared histogram materialized once — see medianApproxBanded
    val hist = centsHistogram(spark, sfDir).localCheckpoint()
    val approx = valueQuantilesApprox(spark, sfDir, accuracy)
      .withColumnRenamed("cents", "approx_cents")
    val ranked = rankOfApprox(hist, approx, Seq("event_type"),
      Seq("event_type", "q"))
    histQuantilesSelect(hist).join(broadcast(ranked), Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("cents"),
        bandVerdict(col("n") * col("q") / lit(100.0)).as("within_band"))
  }

  /** BANDED gate for [[approxDistinctUsers]]: exact distinct count plus
    * the HLL estimate's 5%-relative-error verdict (rsd=0.02, same band
    * RelQueriesSpec pins), in ONE pass — countDistinct and the sketch
    * share the aggregation. Oracle = exact twin + literal TRUE. */
  def approxDistinctUsersBanded(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("a"))
      .select(col("event_type"), col("n_users"),
        (abs(col("a") - col("n_users")).cast("double") / col("n_users") <=
          lit(0.05)).as("within_band"))

  /** As-of join: each (synthetic-dated) event matched to the user's
    * latest order on-or-before that date — `operators.AsOfJoin`. The
    * customer count folds into the plan as a broadcast single-row
    * cross join (one job total, instead of a separate driver-side
    * count() action per invocation). */
  def eventOrderAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val nCust = broadcast(
      t(spark, sfDir, "customer").agg(count(lit(1)).as("n_cust")))
    val ev = t(spark, sfDir, "events")
      .crossJoin(nCust)
      .select(col("event_id"),
        pmod(col("user_id"), col("n_cust")).as("user_key"),
        date_add(lit("1995-01-01").cast("date"),
          pmod(col("event_id"), lit(2500)).cast("int")).as("day"))
    val ord = t(spark, sfDir, "orders")
      .select(col("o_custkey").as("user_key"),
        col("o_orderdate").cast("date").as("day"),
        col("o_orderkey"))
    graft.operators.AsOfJoin.asof(ev, ord, key = "user_key", t = "day",
        payload = "o_orderkey")
      .select(col("event_id"), col("user_key"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("o_orderkey"))
  }
}
