package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Tables

/** The reference-surface analytics inventory (SURVEY.md §2), re-expressed
  * over the driver's TPC-H-ish corpus. Every query here has a DuckDB oracle
  * twin in [[Analytics.oracles]] with IDENTICAL column names and an
  * IDENTICAL deterministic total order.
  *
  * Scale notes baked into each plan:
  *  - tiny dims (part/nation/supplier/customer-for-enrichment) are
  *    `broadcast()` so fact-side rows never shuffle for the join;
  *  - fact⋈fact (lineitem⋈orders) is left to shuffle on the join key — the
  *    correct strategy at 100 TB;
  *  - group-bys are all low-cardinality (≤ a few thousand groups), so the
  *    map-side partial aggregation collapses the shuffle to almost nothing;
  *  - top-k is `orderBy().limit(k)` ⇒ Spark plans TakeOrderedAndProject
  *    (per-partition heaps, no global sort);
  *  - double aggregates use the DECIMAL(38,6) exact-sum helpers from
  *    [[graft.functions]] so results are partition-order independent.
  */
object Analytics {

  /** Timestamp outputs are written as TIMESTAMP_NTZ so the parquet the
    * driver hashes is timezone-naive, matching DuckDB's naive timestamps.
    */
  private def ntz(c: org.apache.spark.sql.Column) = c.cast("timestamp_ntz")

  // ---------------------------------------------------------------- q01
  /** A1/A2-family: grouped sum/avg/count over the fact table (TPC-H Q1
    * shape; reference: assignment1.ipynb:262–305).
    */
  def q01PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    // measured, not assumed: the testdata's single-row-group lineitem file
    // makes this scan+partial-agg single-task, and an in-plan rebalancing
    // exchange does NOT help (warm 1.7 s → 1.9 s at sf0.1 — the decode is
    // still serial). The fix is the LAYOUT level (Tables.lineitemMulti's
    // staged multi-file serving copy): parallel decode + parallel decimal
    // partials, 2.32 → 0.36 s warm (r19 Profile A/B).
    val li = Tables.lineitemMulti(spark, sfDir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsumr(col("l_quantity")).as("sum_qty"),
        dsumr(col("l_extendedprice")).as("sum_base_price"),
        dsumr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- q02
  /** V4–V8: the cleaning filters as one conjunctive, pushdown-friendly
    * predicate (reference: assignment1.ipynb:112–143). Emits the surviving
    * rows; per-rule counts are observe() metrics (see [[Cleaning]]).
    */
  private val lineitemCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate")

  /** Cleaning ruleset shared by q02 (surviving rows) and q17 (per-rule
    * removal accounting). Order matters: sequential attribution.
    */
  val cleaningRules: Seq[Cleaning.Rule] = Seq(
    Cleaning.Rule("nulls", Cleaning.notNull(Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"))),
    Cleaning.Rule("quantity", col("l_quantity") > 0),
    Cleaning.Rule("price_pos", col("l_extendedprice") > 0),
    Cleaning.Rule("price_cap", col("l_extendedprice") <= 100000),
    Cleaning.Rule("discount", col("l_discount").between(0.0, 1.0)))

  def q02CleanLineitem(spark: SparkSession, sfDir: String, ordered: Boolean = true): DataFrame = {
    val li = Tables.lineitemMulti(spark, sfDir)
    val cleaned = Cleaning.clean(li, cleaningRules)
      .select(lineitemCols.map(c => if (c == "l_shipdate") ntz(col(c)).as(c) else col(c)): _*)
    if (ordered) cleaned.orderBy(lineitemCols.map(col): _*) else cleaned
  }

  // ---------------------------------------------------------------- q03
  /** P1–P4 derived columns over a fact⋈fact join: ship delay in days, ship
    * weekday, guarded qty/day ratio (reference: assignment1.ipynb:187–198).
    */
  def q03Derived(spark: SparkSession, sfDir: String, ordered: Boolean = true): DataFrame = {
    val li = Tables.lineitemMulti(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val delay = Derive.deltaDays(col("o_orderdate"), col("l_shipdate"))
    val derived = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r6(delay).as("ship_delay_days"),
        Derive.dayNameOf(col("l_shipdate")).as("ship_dow"),
        r6(Derive.guardedRatio(col("l_quantity"), delay)).as("qty_per_day"))
    if (ordered)
      derived.orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_delay_days"), col("qty_per_day"))
    else derived
  }

  // ---------------------------------------------------------------- q04
  /** P5 code→label mapping with no-match⇒null semantics (app.py:120–127). */
  def q04LabelMap(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.select(
        Derive.labelMap(col("l_returnflag"),
          Map("A" -> "Accepted", "N" -> "None", "R" -> "Returned"))
          .as("returnflag_label"))
      .groupBy(col("returnflag_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("returnflag_label"))
  }

  // ---------------------------------------------------------------- q05
  /** J1+A1+O1: broadcast dim join → group-count → top-10 ("busiest pickup
    * zones", assignment1.ipynb:261–271).
    */
  def q05TopParts(spark: SparkSession, sfDir: String): DataFrame =
    q05TopPartsOn(Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir))

  /** The aggregate body over explicit inputs — the feed layer serves it
    * from the CLEAN lineitem table ([[CleanStore]]), the registry from the
    * raw scan.
    */
  def q05TopPartsOn(li: DataFrame, p: DataFrame): DataFrame =
    // no broadcast hint: part scales with SF (unlike the reference's fixed
    // 265-row zones dim) — size stats/AQE broadcast it at dashboard scale
    // and shuffle it at 100 TB, which a hardcoded hint would prevent
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("total_trips"))
      .orderBy(col("total_trips").desc, col("p_name"))
      .limit(10)

  // ---------------------------------------------------------------- q06
  /** A2+O3: avg value by hour ("hourly fare", assignment1.ipynb:298–306). */
  def q06HourlyAvg(spark: SparkSession, sfDir: String): DataFrame =
    q06HourlyAvgOn(Tables.events(spark, sfDir))

  def q06HourlyAvgOn(e: DataFrame): DataFrame =
    e.select(Derive.hourOf(col("ts")).as("event_hour"), col("value"))
      .groupBy(col("event_hour"))
      .agg(davg(col("value")).as("avg_value"), count(lit(1)).as("n_events"))
      .orderBy(col("event_hour"))

  // ---------------------------------------------------------------- q07
  /** A3+W1: percent-of-total via window over the aggregate (the reference's
    * only window function, assignment1.ipynb:333–341).
    */
  def q07PctOfTotal(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("percentage",
        r6(col("n") * lit(100.0) / sum(col("n")).over(Window.partitionBy())))
      .orderBy(col("percentage").desc, col("event_type"))
  }

  // ---------------------------------------------------------------- q08
  /** A4+F5+F6+O5: filtered conditional average by weekday with the custom
    * categorical weekday sort (assignment1.ipynb:369–385).
    */
  def q08CondAvgByWeekday(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val cond = when(col("l_quantity") > 0, col("l_discount"))
    li.filter(col("l_returnflag") === "R")
      .select(Derive.dayNameOf(col("l_shipdate")).as("ship_dow"), col("l_quantity"), col("l_discount"))
      .groupBy(col("ship_dow"))
      .agg(r6(dsum(cond) / count(cond) * 100).as("avg_disc_pct"))
      .orderBy(weekdayRank(col("ship_dow")))
  }

  // ---------------------------------------------------------------- q09
  /** J2+A5+O2: the same dim joined twice under different roles (zones-as-
    * pickup/dropoff, assignment1.ipynb:411–426) → nation-pair route counts.
    */
  def q09TopRoutes(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val cn = n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val sn = n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      // nation (25 rows, fixed) is safe to broadcast forever; supplier
      // SCALES WITH THE FACT TABLES (SF×10k rows) — no hint, let the
      // threshold/AQE decide, so a 100 TB run shuffles it instead of
      // OOMing the driver.
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("route_count"))
      .orderBy(col("route_count").desc, col("cust_nation"), col("supp_nation"))
      .limit(5)
  }

  // ---------------------------------------------------------------- q10
  /** J3+A6+O6+O7: top-k counts LEFT-enriched from a dim, re-sorted
    * ascending for display (app.py:150–169). Left join keeps ids with no
    * dim match (null name).
    */
  def q10TopUsersEnriched(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"))
    val top = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(10)
    // no broadcast hint: customer SCALES with SF (hinting it broadcast
    // would OOM the driver at 100 TB); the stream side here is 10 rows, so
    // whatever join AQE picks is trivially cheap
    top.join(c, col("user_id") === col("c_custkey"), "left")
      .select(col("user_id"), col("n_events"), col("c_name"))
      .orderBy(col("n_events").asc, col("user_id"))
  }

  // ---------------------------------------------------------------- q11
  /** A7: day-of-week × hour heatmap feed (app.py:323–329). */
  def q11Heatmap(spark: SparkSession, sfDir: String): DataFrame =
    q11HeatmapOn(Tables.events(spark, sfDir))

  def q11HeatmapOn(e: DataFrame): DataFrame =
    e.select(
        Derive.dayNameOf(col("ts")).as("day_of_week"),
        Derive.hourOf(col("ts")).as("event_hour"))
      .groupBy(col("day_of_week"), col("event_hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(weekdayRank(col("day_of_week")), col("event_hour"))

  // ---------------------------------------------------------------- q12
  /** A8+A9: global scalar metrics in ONE aggregate job (five dashboard
    * tiles + widget bounds, app.py:109–130).
    */
  def q12GlobalMetrics(spark: SparkSession, sfDir: String): DataFrame =
    q12GlobalMetricsOn(Tables.events(spark, sfDir))

  def q12GlobalMetricsOn(e: DataFrame): DataFrame =
    e.agg(
      count(lit(1)).as("n_events"),
      davg(col("value")).as("avg_value"),
      dsumr(col("value")).as("total_value"),
      epochSeconds(min(col("ts"))).as("min_ts_epoch"),
      epochSeconds(max(col("ts"))).as("max_ts_epoch"))

  // ---------------------------------------------------------------- q13
  /** A11+F4: equal-width histogram binning as an aggregation (the
    * trip-distance histogram feed, app.py:246–255).
    */
  def q13Histogram(spark: SparkSession, sfDir: String): DataFrame =
    q13HistogramOn(Tables.lineitem(spark, sfDir))

  def q13HistogramOn(li: DataFrame): DataFrame =
    li.filter(col("l_extendedprice") > 0 && col("l_extendedprice") < 100000)
      .select(floor(col("l_extendedprice") / 1000).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bin"))

  // ---------------------------------------------------------------- q14
  /** V10/A12: per-column null census as one aggregate row. */
  def q14NullCensus(spark: SparkSession, sfDir: String): DataFrame =
    Cleaning.nullCensus(Tables.lineitem(spark, sfDir))

  // ---------------------------------------------------------------- q15
  /** A6: value_counts — group-count sorted descending (app.py:152–156). */
  def q15ValueCounts(spark: SparkSession, sfDir: String): DataFrame =
    q15ValueCountsOn(Tables.events(spark, sfDir))

  def q15ValueCountsOn(e: DataFrame): DataFrame =
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type"))

  // ---------------------------------------------------------------- q16
  /** S2: projection + predicate — both must reach the parquet scan
    * (PushedFilters / ReadSchema, SURVEY.md §4).
    */
  def q16Projection(spark: SparkSession, sfDir: String, ordered: Boolean = true): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val projected = li.filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        ntz(col("l_shipdate")).as("l_shipdate"))
    if (ordered)
      projected.orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_shipdate"))
    else projected
  }

  // ---------------------------------------------------------------- q17
  /** V9 as its own query: sequential-attribution removal accounting over
    * the q02 ruleset, one aggregate row (assignment1.ipynb:147–164).
    */
  def q17RemovalAccounting(spark: SparkSession, sfDir: String): DataFrame =
    Cleaning.accountingAgg(Tables.lineitem(spark, sfDir), cleaningRules)

  // ---------------------------------------------------------------- q18
  /** Two-hop dimension chain (customer → nation → region): both dims are
    * fixed-cardinality (25 / 5 rows) so both joins broadcast — the fact
    * side never shuffles until the 5-group aggregate. Completes star
    * coverage: every corpus table is read by some registry query.
    */
  def q18RegionRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), davg(col("c_acctbal")).as("avg_acctbal"))
      .orderBy(col("r_name"))
  }

  // ---------------------------------------------------------------- q19
  /** A13: exact percentile profile of the quantity distribution per
    * return flag — the summary q13's bin choice comes from. Spark's exact
    * `percentile` aggregate and DuckDB's `quantile_cont` share the
    * (n−1)·p linear-interpolation definition, so the profile is
    * oracle-hashable (r6 absorbs last-ulp interpolation-order
    * differences). Scale: exact percentile state is a value→count map,
    * so its memory AND its partial-agg shuffle scale with the DISTINCT
    * values per group — quantity's bounded domain (~50 values) keeps
    * that tiny at any corpus size, the same reason production exact
    * percentiles run on bucketed/decimal-scaled columns. (The first cut
    * ran on the near-unique l_extendedprice: 2.5 s warm at sf0.1, all of
    * it map-side state churn.) An unbounded-domain column takes the same
    * plan with `percentile_approx`; the exact form is kept because the
    * oracle can hash-match it.
    */
  def q19Percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D, 0.95D))").as("q"))
      .select(col("l_returnflag"), col("n"),
        r6(col("q")(0)).as("p25"), r6(col("q")(1)).as("p50"),
        r6(col("q")(2)).as("p75"), r6(col("q")(3)).as("p95"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q20
  /** AS-OF join (last-observation-carried-forward): attach to every event
    * the timestamp of the same user's most recent PRIOR-or-equal `signup`
    * event — the session-anchor/feature-engineering primitive ("state as
    * of this moment") that Spark has no native operator for. Preference
    * order per the build rules: COMPOSE before customizing — an
    * ignore-nulls `last` over a (user, time)-ordered running window IS
    * the as-of join when the two sides share a partition key: one
    * shuffle on user_id, no range join, no custom SparkPlan. A true
    * two-table as-of (market-data style) is the same plan over the
    * UNION of both sides tagged by origin. Tie order is pinned by
    * (ts, event_id) so the result is deterministic and oracle-hashable;
    * DuckDB's `last_value(... IGNORE NULLS)` over the identical frame is
    * the twin.
    */
  def q20AsofAnchor(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("anchor_ts",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"),
        epochSeconds(col("ts")).as("ts_sec"),
        epochSeconds(col("anchor_ts")).as("anchor_sec"),
        (epochSeconds(col("ts")) - epochSeconds(col("anchor_ts"))).as("since_anchor_sec"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q21
  /** Top-k PER GROUP (top-3 suppliers per nation by revenue) — the
    * grouped-leaderboard shape every dashboard and per-bucket report
    * needs, distinct from the global top-k (q05): a `row_number` window
    * over the aggregate, filtered to k. Spark rewrites the rank filter
    * into WindowGroupLimit (per-partition top-k heaps BEFORE the window
    * sort — audited in PlanSpec), so no group ever materializes more
    * than k + heap rows: the plan survives a nation with a billion
    * suppliers. Revenue is the exact DECIMAL sum rounded (r6) — both
    * engines rank the identical double, ties broken by name.
    */
  def q21TopPerGroup(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val rev = li.join(s, col("l_suppkey") === col("s_suppkey"))
      // supplier scales with SF — no hint; nation is fixed 25 rows
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_name"))
      .agg(dsumr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("revenue").desc, col("s_name"))
    rev.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("n_name"), col("rk"))
  }

  // ---------------------------------------------------------------- q22
  /** Ordered event funnel (view → click-within-24h → purchase-within-
    * 24h): per user, the first view, the first click inside the
    * 24-hour window after that view, and the first purchase inside the
    * 24-hour window after that click — then one corpus-level conversion
    * row. The sequential dependency (stage n's window condition
    * references stage n−1's result) is expressed as CHAINED window
    * aggregates over the same `user_id` partitioning, so Catalyst plans
    * ONE exchange and evaluates all three stages in a single window
    * pass per partition (audited in PlanSpec) — the
    * self-join-per-stage formulation would shuffle the fact table once
    * per stage. State per user is three timestamps: safe at any scale.
    */
  def q22Funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val step = expr("INTERVAL 24 HOURS")
    val s1 = min(when(col("event_type") === "view", col("ts"))).over(w)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("s1", s1)
      .withColumn("s2",
        min(when(col("event_type") === "click" && col("ts") >= col("s1")
          && col("ts") <= col("s1") + step, col("ts"))).over(w))
      .withColumn("s3",
        min(when(col("event_type") === "purchase" && col("ts") >= col("s2")
          && col("ts") <= col("s2") + step, col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("s1")).as("u1"), min(col("s2")).as("u2"), min(col("s3")).as("u3"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("u1")).as("n_view"),
        count(col("u2")).as("n_click_after_view"),
        count(col("u3")).as("n_purchase_after_click"),
        r6(count(col("u3")) * lit(100.0) / count(col("u1"))).as("conversion_pct"))
  }

  // ---------------------------------------------------------------- q23
  /** Rolling time-series feature: daily event counts per type with a
    * trailing 7-day moving average — the ROWS-frame window family (q07
    * is the unbounded frame, q20 the running frame; this is the sliding
    * frame). The window partitions by `event_type`, so after the daily
    * aggregate (whose output is bounded by types × days) no single
    * partition ever holds more than one type's history — there is no
    * global single-partition sort at any scale. The average is the
    * exact integer window sum divided by the window count: identical
    * arithmetic in both engines.
    */
  def q23RollingDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("ma7", r6(sum(col("n")).over(w) / count(col("n")).over(w)))
      .select(col("event_type"), ntz(col("day")).as("day"), col("n"), col("ma7"))
      .orderBy(col("event_type"), col("day"))
  }

  // ---------------------------------------------------------------- q24
  /** Semi-structured extraction: parse the `props` JSON payload column
    * with an EXPLICIT schema (`from_json` — one codegen'd parse per row;
    * schema-on-read with a declared contract, never the
    * infer-by-sampling path, which at 100 TB means a second full scan)
    * and roll the extracted field up per event type. Malformed or
    * missing payloads parse to null and are counted, not thrown — the
    * PERMISSIVE posture a pipeline needs when one bad row must not kill
    * a day's ingest.
    */
  def q24JsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        // the strict-JSON first-key integer-token contract (see
        // JsonFirstLong's scaladoc): the adversarial-events replay showed
        // every builtin diverging from DuckDB on garbage props —
        // from_json is lenient (single quotes) and LAST-duplicate-key,
        // get_json_object unquotes string values; the native expression
        // pins one auditable rule and the oracle computes its exact twin
        call_function("json_first_long", col("props"), lit("k")).as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        r6(sum(col("k")) / count(col("k"))).as("avg_k"))
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q25
  /** ANTI-join analytics: customers with NO events (the churn/inactive
    * report), rolled up by market segment. The anti join is the
    * existence-check operator — no `distinct` pre-pass (the join itself
    * is a set-membership probe, and a distinct would add a second
    * shuffle of the fact side). Both sides scale with SF, so the join
    * shuffles on the key at 100 TB (and AQE broadcasts whichever side
    * its runtime stats say is small enough). The SEMI join is the same
    * plan with `left_semi`.
    */
  def q25InactiveCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val e = Tables.events(spark, sfDir)
    c.join(e, col("c_custkey") === col("user_id"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_inactive"), davg(col("c_acctbal")).as("avg_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  // ---------------------------------------------------------------- q26
  /** PIVOT: daily event counts spread into one column per event type —
    * the wide dashboard feed. The pivot values are an EXPLICIT list
    * (never inferred: inference is a full extra scan at 100 TB, and an
    * unexpected new type silently widening the schema is a contract
    * violation, not a feature); absent combinations are 0, not null,
    * matching the conditional-count SQL twin.
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def q26PivotDaily(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .select(ntz(col("day")).as("day") +: EventTypes.map(col): _*)
      .orderBy(col("day"))

  // ---------------------------------------------------------------- q27
  /** ROLLUP (grouping sets): customer counts and exact account-balance
    * sums at three grain levels — (region, nation), (region), grand
    * total — in ONE aggregation pass (Spark expands the grouping sets
    * map-side; the alternative is three jobs over the same scan).
    * Subtotal rows carry NULL group keys; the deterministic order
    * pins NULLS FIRST explicitly because Spark's ascending default and
    * DuckDB's disagree (Spark NULLS FIRST, DuckDB NULLS LAST).
    */
  def q27RollupTotals(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsumr(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q45
  /** CUBE — every grouping combination of (event day-of-week, type) in
    * ONE aggregation pass: (dow, type) / (dow) / (type) / grand total,
    * completing the grouping-sets family beside q27's hierarchical
    * ROLLUP (a rollup drops dimensions right-to-left; a cube is the full
    * power set — the slice-any-way dashboard feed). Same execution shape:
    * a map-side Expand emits one row per grouping set, one hash
    * aggregate, one shuffle — never one job per grain. NULLS FIRST
    * pinned explicitly (Spark and DuckDB ascending defaults disagree).
    */
  def q45CubeActivity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(weekdayName(col("ts")).as("dow"), col("event_type"))
      .cube(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      // n as the third key: with NULL-keyed data rows planted (adversarial
      // events), CUBE ties on (dow, event_type) — the per-dow marginal vs
      // the real NULL-type group. (dow, event_type, n) is still not a
      // strictly total order — when EVERY event in a dow has NULL type,
      // the marginal and the real NULL group tie on all three keys — but
      // those residual-tied rows are value-IDENTICAL, so any interleaving
      // hash-verifies; grouping_id() as a fourth key would make the order
      // genuinely total at the cost of threading it through the oracle
      .orderBy(col("dow").asc_nulls_first,
        col("event_type").asc_nulls_first, col("n"))

  // ---------------------------------------------------------------- q49
  /** Robust outlier profile per group: MEDIAN + MAD (median absolute
    * deviation) + the |x − med| > 3·MAD outlier count — the
    * heavy-tail-safe twin of F4's stddev z-score window (one whale
    * order moves a mean/stddev fence; the median/MAD fence doesn't
    * move). MAD is inherently two-phase (the deviation needs the median
    * first), so the plan is three aggregate passes, each collapsing
    * map-side to the ~|event_type| grain with the tiny result broadcast
    * back — at 100 TB that is three scans whose shuffles carry a few
    * rows each, never a sort and never a data-scaled join side.
    * Exactness: Spark's `percentile` ≡ DuckDB's `quantile_cont` (the
    * q19-established interpolation match), deviations are single IEEE
    * subtract/abs ops on identical doubles, and the 3·MAD fence compare
    * is one multiply — the outlier SET is engine-identical, not just
    * the rounded summary.
    */
  def q49RobustOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5D)").as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(dev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("medv"), max(col("mad")).as("madv"),
        sum(when(col("dev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n"), r6(col("medv")).as("med_value"),
        r6(col("madv")).as("mad_value"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q50
  /** Cohort retention grid — the growth-analytics shape the registry
    * still lacked (q22 is the ordered funnel; this is the "weekly
    * cohorts × week-offset retention" matrix every activation dashboard
    * plots). Cohort = ISO week (Monday-start `date_trunc`, identical in
    * both engines under the UTC session) of a user's FIRST event;
    * each (cohort, offset) cell counts the cohort's users active in
    * that calendar week, plus the retention percentage against the
    * cohort's own size (its offset-0 cell — every user is by
    * construction active in their first week).
    *
    * Scale: ONE user_id shuffle builds the per-user week set as a
    * `collect_set` whose bound is the CALENDAR (weeks the corpus spans),
    * not the data — 10 years is 522 entries — so per-group state stays
    * constant at 100 TB while map-side partial aggregation collapses
    * the per-user duplicate (user, week) pairs before they travel. The
    * first array element IS the cohort (sorted set), so first-touch
    * attribution costs no second aggregate; the grid then re-aggregates
    * at (cohort, offset) grain — calendar² rows — and the cohort size is
    * a `first` window over that POST-AGGREGATE frame (offset 0 leads
    * every cohort's ordered cells by construction), so the event stream
    * is scanned exactly once — a join back to an offset-0 base would
    * recompute the whole lineage for the build side.
    */
  def q50RetentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    // cohorts are per-USER: an anonymous (NULL-user) event belongs to no
    // cohort. SQL's equi-join naturally drops it; the groupBy formulation
    // would keep a phantom NULL-user member (one cohort off by one on the
    // adversarial-events corpus), so the screen is explicit here.
    val wk = Tables.events(spark, sfDir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val perUser = wk.groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("week"))).as("weeks"))
      .select(col("weeks").getItem(0).as("cohort"),
        explode(col("weeks")).as("week"))
    // (user, week) pairs are unique post-collect_set, so count(1) IS the
    // distinct-user count — no countDistinct shuffle needed
    val grid = perUser.groupBy(col("cohort"),
        (datediff(col("week"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("week_offset"))
    grid.withColumn("cohort_size", first(col("n_active")).over(w))
      .select(ntz(col("cohort")).as("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_size"),
        r6(col("n_active") * lit(100.0) / col("cohort_size")).as("retention_pct"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  // ---------------------------------------------------------------- q48
  /** The distribution-rank window family — `ntile` / `percent_rank` /
    * `cume_dist` — the one window shape (W1–W7 cover aggregates, LOCF,
    * lag, ROWS/RANGE frames, group-limits) still missing: where does
    * each row SIT within its group's distribution. Deciles feed
    * histogram-equalized dashboards; percent_rank/cume_dist are the
    * plotting positions for Q-Q/CDF panels.
    *
    * Determinism: ntile splits ties by ROW POSITION, so the window
    * ORDER BY carries the key tie-break (price, orderkey) — a total
    * order makes ntile, percent_rank ((rank−1)/(N−1)) and cume_dist
    * (rank/N) all engine-exact; the two double divisions are single
    * IEEE ops, r6-rounded at the edge.
    *
    * Scale: one window pass partitioned by priority class. Ranking
    * against a whole-partition distribution REQUIRES that partition's
    * total order — this plan sorts within the 5 bounded classes (each
    * class spreads over the cluster's range-partitioned sort, not one
    * task). When the grain must be finer at 100 TB, q41's two-phase
    * distributed rank is the approximation escape hatch; this operator
    * is the exact-semantics member of that family.
    */
  def q48WindowRanks(spark: SparkSession, sfDir: String): DataFrame = {
    // NULLS FIRST pinned INSIDE the window: Spark's ascending default
    // ranks NULL order values first, DuckDB's ranks them LAST — with
    // NULL prices planted (adversarial orders) the rank VALUES diverge
    // unless both engines are pinned to one position (r15 advorders
    // catch). The output sort is total over every output column so
    // duplicate-key rows (also planted) hash deterministically.
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    Tables.orders(spark, sfDir)
      // + 0.0 canonicalizes the zero SIGN (os1's NormalizeFloatingNumbers
      // twin): a planted -0.0 row fully tied with a 0.0 row is otherwise
      // placed arbitrarily by each engine's sort (they compare equal)
      // and the differing sign breaks the hash
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("o_totalprice") + lit(0.0)).as("o_totalprice"),
        ntile(10).over(w).cast("long").as("decile"),
        r6(percent_rank().over(w)).as("pct_rank"),
        r6(cume_dist().over(w)).as("cum_dist"))
      .orderBy(col("o_orderkey").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first,
        col("o_totalprice").asc_nulls_first,
        col("decile"), col("pct_rank"), col("cum_dist"))
  }

  // ---------------------------------------------------------------- q47
  /** GROUPING SETS with NON-hierarchical sets — ((flag), (status), ()) —
    * the grouping-set family member neither q27's ROLLUP (a
    * right-to-left prefix chain) nor q45's CUBE (the full power set) can
    * express: two independent single-dimension marginals plus the grand
    * total, WITHOUT the (flag, status) cross grain. The dashboard shape
    * this serves is a pair of summary bars sharing one scan. Execution
    * is the same single-pass Expand as rollup/cube: 3 grouping sets ⇒
    * each input row fans to 3 expanded rows, one hash aggregate, one
    * shuffle — vs the naive 3 jobs + union. NULL is the set marker
    * (both dims are non-null in lineitem, so marginals are unambiguous);
    * NULLS FIRST pinned as in q27/q45.
    */
  def q47GroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitemMulti(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), dsumr(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  // ---------------------------------------------------------------- q28
  /** Set operation (EXCEPT): customer keys that placed orders but never
    * produced an event — the §2.10 family the reference lacks entirely.
    * `except` is DISTINCT set difference: both sides dedup map-side
    * then anti-join on the full row — one shuffle each, no driver
    * materialization. INTERSECT and UNION [DISTINCT] are the same plan
    * shape with the join type flipped.
    */
  def q28ExceptKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
      .except(Tables.events(spark, sfDir).select(col("user_id").as("custkey")))
      .orderBy(col("custkey"))

  // ---------------------------------------------------------------- q29
  /** The SKETCH variants the 100 TB plans name as their scale path, shipped
    * as a real operator instead of a comment: per return flag,
    * `approx_count_distinct` (HLL — bounded memory, order-independent
    * register-max merge) next to the exact distinct count, and
    * `percentile_approx` (bounded-memory quantile sketch) next to the
    * exact percentile (q19's operator). An exact distinct over a
    * high-cardinality column keys a partial-dedup map that scales with
    * the distinct count per group; the HLL is fixed-size per group at
    * any cardinality. Sketch estimates are engine-specific by nature
    * (DuckDB's HLL produces different estimates from Spark's) ⇒
    * rows-only gate; the accuracy floors vs the exact twins are
    * asserted in SqlTwinsSpec.
    */
  def q29ApproxSketches(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    // The exact distinct count runs as its OWN aggregation, joined back on
    // the 3-row result: mixing countDistinct with buffer-heavy aggregates
    // in one agg makes Spark key the FIRST partial aggregate by
    // (group, distinct-col) — every percentile/HLL buffer then exists once
    // per (flag, partkey) pair (~20k buffers here, one per distinct key at
    // 100 TB) and is merged through two extra exchanges. Measured at
    // sf0.1: 7.9 s → ~1 s warm. The split is the plan you want at scale:
    // sketches stream once over the data; the distinct count dedups
    // (flag, partkey) with plain map-side combine.
    val sketches = li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("percentile(l_quantity, 0.5D)").as("exact_p50"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_p50"))
    val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
    // Explicit build side: both join inputs are 3-row (per-flag)
    // aggregates and the un-hinted build-side choice sat on the AQE
    // stats borderline — r16's takes flipped it (the whitelist's q29
    // entry). Broadcasting the exact-count side pins the plan the
    // stable isolated runs always chose; free at any scale (#flags
    // rows).
    sketches.join(broadcast(exact), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"), col("exact_parts"),
        col("approx_parts"), col("exact_p50"), col("approx_p50"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- q30
  /** CO-LOCATED fact⋈fact join served from the bucketed staging
    * ([[graft.sources.BucketStore]]): lineitem and orders are both
    * bucketed by their join key at staging time, so this join reads
    * bucket i against bucket i with NO Exchange on either side — the
    * sort-merge join's sorts are also satisfied by the bucket files'
    * `sortBy` order (PlanSpec audits zero exchanges below the join).
    * The `merge` hint pins the co-located SMJ at every scale factor:
    * without it the optimizer would broadcast the small driver-corpus
    * orders side and the bench would measure a plan that cannot exist
    * at 100 TB. Contrast q03/q09, which join the same facts through the
    * shuffle path — that pair is the "first join of a fresh dataset"
    * cost; this is the "every nightly join after staging once" cost.
    */
  def q30BucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.sources.BucketStore.lineitemByOrderkey(spark, sfDir)
    val o = graft.sources.BucketStore.ordersByOrderkey(spark, sfDir)
    li.hint("merge")
      .join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        dsumr(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------- q31
  /** LAG window (inter-event gaps): per user, the time since the same
    * user's previous event — the sequential-dependency window family
    * (q20 is ignore-nulls `last`, q23 the sliding frame; this is the
    * offset function). One shuffle on `user_id`; the per-user output is
    * a bounded aggregate row, so nothing data-scaled leaves the window
    * stage. Gaps are integer epoch-second differences (exact in both
    * engines); the mean divides the exact integer sum — a user's first
    * event has a NULL gap and drops out of `count(gap)` in both engines
    * identically. Tie order inside a user is pinned by (ts, event_id).
    */
  def eventGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_sec",
        epochSeconds(col("ts")) - lag(epochSeconds(col("ts")), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("gap_sec")).as("n_gaps"),
        r6(sum(col("gap_sec")) / count(col("gap_sec"))).as("avg_gap_sec"),
        max(col("gap_sec")).as("max_gap_sec"))
      .orderBy(col("user_id"))
  }

  def q31EventGaps(spark: SparkSession, sfDir: String): DataFrame =
    eventGaps(Tables.events(spark, sfDir))

  // ---------------------------------------------------------------- q37
  /** The SAME gap analysis served from the user-bucketed staging
    * ([[graft.sources.BucketStore.eventsByUser]]): bucketing satisfies
    * the window's distribution requirement, so the whole chain — lag
    * window, per-user rollup — runs with ZERO hash exchange (PlanSpec
    * audits: the only exchange left is the output sort). q30 is
    * bucketing-for-joins; this is bucketing-for-windows — together the
    * shuffle-once-serve-forever posture for every per-entity analysis
    * at 100 TB.
    */
  def q37BucketedGaps(spark: SparkSession, sfDir: String): DataFrame =
    eventGaps(graft.sources.BucketStore.eventsByUser(spark, sfDir))

  // ---------------------------------------------------------------- q32
  /** Moment statistics (stddev / correlation) with CROSS-ENGINE-EXACT
    * results: the five sufficient moments (n, Σx, Σy, Σx², Σy², Σxy) are
    * exact DECIMAL(38,6) sums — order-independent, mergeable, one
    * map-side-combined pass — and the statistics are derived from them
    * with the IDENTICAL double expression in both engines (each IEEE op
    * on identical inputs is deterministic; sqrt is correctly rounded
    * everywhere). The built-in `stddev`/`corr` aggregates stream
    * Welford-style updates whose double accumulation is partition-order
    * dependent — fine in isolation, unhashable across engines; the
    * moment formulation is the portable (and at 100 TB the CHEAPER)
    * plan: five decimal sums per group, no second pass. Moments are over
    * (quantity, discount) — bounded magnitudes, so the 6-decimal cast of
    * the squared terms is far from the double-shortest-repr knife edge.
    */
  def q32MomentStats(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitemMulti(spark, sfDir)
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val sxx = col("sxx"); val syy = col("syy"); val sxy = col("sxy")
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum(col("l_discount")).as("sy"),
        dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
        dsum(col("l_discount") * col("l_discount")).as("syy"),
        dsum(col("l_quantity") * col("l_discount")).as("sxy"))
      .select(col("l_returnflag"), n,
        r6(sx / n).as("mean_qty"),
        r6(sqrt((sxx - sx * sx / n) / n)).as("stddev_qty"),
        r6((sxy - sx * sy / n) /
          sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).as("corr_qty_disc"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- q33
  /** INTERSECT — the q28 claim ("same plan shape, join type flipped")
    * shipped as an operator: customer keys that BOTH placed orders AND
    * produced events. Distinct set intersection = map-side dedup of each
    * side, then a LEFT SEMI join; one shuffle per side, no driver
    * materialization, same scale posture as EXCEPT.
    */
  def q33IntersectKeys(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(col("o_custkey").as("custkey"))
      .intersect(Tables.events(spark, sfDir).select(col("user_id").as("custkey")))
      .orderBy(col("custkey"))

  // ---------------------------------------------------------------- q34
  /** Date-spine gap filling: the complete (event_type × day) grid over
    * the corpus date range, with absent combinations as explicit zeros —
    * the time-series continuity operator every dashboard and rolling
    * window needs (q23's 7-day average silently skips missing days
    * without it). The spine is GENERATED, not scanned: a 1-row global
    * min/max aggregate broadcast into `sequence()` + `explode` against
    * the distinct type list — types × days rows, never data-scaled —
    * then a left join fills observed counts. At 100 TB the daily
    * aggregate is the only full scan; the spine costs nothing.
    */
  def q34DateSpineFill(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val daily = e.select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val bounds = e.agg(
      min(to_date(col("ts"))).as("dmin"), max(to_date(col("ts"))).as("dmax"))
    val spine = e.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("dmin"), col("dmax"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), ntz(col("day")).as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("day"))
  }

  // ---------------------------------------------------------------- q35
  /** Latest record per key (CDC compaction / dedup-by-recency): each
    * user's most recent event — the upsert-log → current-snapshot
    * operator every mutable-entity pipeline runs. `row_number() = 1`
    * over (ts, event_id) DESC, which Spark rewrites to WindowGroupLimit
    * (audited): per-partition one-row heaps before the window sort, so a
    * key with a billion updates never materializes its history. Tie
    * order pinned by event_id so the snapshot is deterministic.
    */
  def q35LatestPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"), col("event_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), ntz(col("ts")).as("ts"), col("event_type"),
        col("value"), col("event_id"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q38
  /** Interval (range) join at scale: events matched to the campaign
    * windows containing them — the point-in-interval join behind
    * attribution, promo analysis and slowly-changing-dimension lookups.
    * A non-equi join has no hash key, so Spark's only direct plan is a
    * nested-loop — O(events × windows). This operator ships the
    * DAY-BINNING rewrite instead: each interval is exploded into the
    * calendar days it covers (bounded: days-per-window rows per interval,
    * never data-scaled), the fact side computes its day ONCE, and the
    * join becomes an EQUI join on the day bin plus a residual range
    * predicate for the partial edge days. An event's bin is unique, so no
    * event duplicates within one interval; overlapping intervals match
    * independently (the semantics of the join). With a bounded window dim
    * the binned dim broadcasts — the fact side never shuffles for the
    * join (audited: BroadcastHashJoin, no BroadcastNestedLoopJoin); with
    * a data-scaled interval side the same rewrite yields a plain
    * day-keyed shuffle join — either way, never a nested loop.
    *
    * The windows are deliberately NOT day-aligned (06:00 starts, 4.5-day
    * length, overlapping stride 3) so the residual predicate does real
    * work. The distinct-user count runs through Spark's standard two-phase
    * distinct aggregate (partial keyed by (campaign, user) — plain
    * counts, no per-key buffers, the q29 trap doesn't apply).
    */
  /** The q38/st15 campaign-window dim: 10 overlapping, non-day-aligned
    * intervals (06:00 starts, 4.5-day length, stride 3).
    */
  def campaignWindows(spark: SparkSession): DataFrame =
    spark.range(10).select(
      col("id").as("campaign_id"),
      expr("timestamp'2024-01-01 06:00:00' + make_dt_interval(3 * id)").as("start_ts"),
      expr("timestamp'2024-01-01 06:00:00' + make_dt_interval(3 * id) " +
        "+ make_dt_interval(0, 108)").as("end_ts"))

  /** Each interval exploded into the calendar days it covers — the
    * equi-joinable side of the day-binning rewrite.
    */
  def binnedWindows(spark: SparkSession): DataFrame =
    campaignWindows(spark).select(col("campaign_id"), col("start_ts"), col("end_ts"),
      explode(sequence(to_date(col("start_ts")), to_date(col("end_ts")))).as("day"))

  def q38IntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val binned = binnedWindows(spark)
    Tables.events(spark, sfDir)
      .withColumn("day", to_date(col("ts")))
      .join(broadcast(binned), Seq("day"))
      .filter(col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .groupBy(col("campaign_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsumr(col("value")).as("sum_value"))
      .orderBy(col("campaign_id"))
  }

  // ---------------------------------------------------------------- q39
  /** Schema-evolution union: merge two GENERATIONS of the event log —
    * an early extract that never carried `value`/`props` and the current
    * full schema — into one frame, absent columns null-filled. This is
    * `unionByName(allowMissingColumns = true)`: position-based `union`
    * would silently zip mismatched columns (the classic corruption), and
    * a by-hand projection per generation is exactly what the operator
    * automates. The generations are carved deterministically from the
    * driver corpus (event_id parity) so the result is oracle-exact.
    *
    * Scale shape: a union is plan-level concatenation — zero shuffle,
    * zero data movement; each side keeps its own pushed filters and
    * pruned columns (the merged read is the union of the two
    * generations' scans, which is what reading a schema-evolved
    * partitioned table compiles to anyway).
    */
  def q39UnionEvolve(
      spark: SparkSession, sfDir: String, ordered: Boolean = true): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val gen1 = e.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val gen2 = e.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val merged = gen1.unionByName(gen2, allowMissingColumns = true)
      .select(col("event_id"), ntz(col("ts")).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    if (ordered) merged.orderBy(col("event_id")) else merged
  }

  // ---------------------------------------------------------------- q41
  /** Exact EQUI-DEPTH histogram (equal-frequency deciles) of the price
    * column: bin i holds rows ranked [i·N/k, (i+1)·N/k) in the global
    * (price, orderkey, linenumber) order, reported as (count, min, max)
    * per bin — the boundary profile q13's equal-WIDTH histogram and
    * q19's fixed percentiles don't give. The naive formulation is a
    * GLOBAL row_number — one unpartitioned window over every fact row,
    * the canonical scale-killer — so the global rank is computed with
    * sa6's distributed two-phase prefix sum instead: range-bucket on the
    * price (any monotone bucketing preserves the total order), per-bucket
    * counts → exclusive offsets over the BOUNDED bucket list, intra-bucket
    * row_number partitioned by bucket, rank = offset + local rank.
    * bin = rank·k div N in exact long arithmetic; the oracle IS the
    * naive global formulation, reproduced row-for-row.
    */
  def q41EquidepthHistogram(
      spark: SparkSession, sfDir: String, nbins: Int = 10, buckets: Int = 64): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("p"),
        col("l_orderkey").as("k"), col("l_linenumber").as("ln"))
    val bounds = li.agg(min(col("p")).as("pmin"), max(col("p")).as("pmax"),
      min(col("k")).as("kmin"), max(col("k")).as("kmax"),
      count(lit(1)).as("total"))
    // Degenerate-input guard: a (near-)constant price column would put
    // every row in range-bucket 0 and the intra-bucket row_number would
    // become exactly the unpartitioned global window this two-phase rank
    // exists to avoid. When pmax == pmin the total order (p, k, ln) is
    // decided by k alone, so bucketing on the key (any monotone bucketing
    // preserves the order) keeps the rank distributed. Same output either
    // way — only the partitioning strategy switches.
    val priceB = floor((col("p") - col("pmin")) * buckets
      / (col("pmax") - col("pmin") + 1.0))
    val keyB = floor((col("k") - col("kmin")) * buckets
      / (col("kmax") - col("kmin") + 1.0))
    val bucketed = li.crossJoin(broadcast(bounds))
      .withColumn("b", least(lit(buckets - 1),
        when(col("pmax") > col("pmin"), priceB).otherwise(keyB).cast("int")))
    val offsets = bucketed.groupBy(col("b")).agg(count(lit(1)).as("bn"))
      .withColumn("off",
        coalesce(sum(col("bn")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("b"), col("off"))
    val intra = Window.partitionBy(col("b"))
      .orderBy(col("p"), col("k"), col("ln"))
    bucketed.join(broadcast(offsets), Seq("b"))
      .withColumn("rank", col("off") + row_number().over(intra) - 1)
      .withColumn("bin_id", expr(s"(rank * $nbins) div total"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("p")).as("min_price"), max(col("p")).as("max_price"))
      .orderBy(col("bin_id"))
  }

  // ---------------------------------------------------------------- q42
  /** SCD Type-2 dimension build: each user's event-type history compacted
    * into VERSIONED VALIDITY INTERVALS — a row per change of value with
    * `valid_from`/`valid_to`/`is_current`, consecutive repeats collapsed
    * — the slowly-changing-dimension shape every warehouse keeps beside
    * the q35/st13 current-snapshot view (the snapshot answers "what is",
    * the SCD2 table answers "what was, when"). Change detection is `lag`
    * over the (user, time)-ordered history; interval chaining is `lead`
    * over the surviving change rows. Both windows share ONE user_id
    * partitioning — the filter between them preserves distribution and
    * order, so the plan carries a single hash exchange (q31's argument,
    * audited). Tie order pinned by event_id at both steps.
    */
  def q42Scd2(
      spark: SparkSession, sfDir: String, ordered: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val out = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        ntz(col("ts")).as("valid_from"), ntz(col("valid_to")).as("valid_to"),
        col("valid_to").isNull.as("is_current"))
    // valid_to completes the TOTAL order (a user alternating types at one
    // instant yields rows identical up to valid_to); nulls-first spelled
    // explicitly because Spark's and DuckDB's ascending defaults disagree
    if (ordered)
      out.orderBy(col("user_id"), col("valid_from"), col("event_type"),
        col("valid_to").asc_nulls_first)
    else out
  }

  // ---------------------------------------------------------------- q43
  /** CROSS-TABLE as-of join: each event matched to its user's most
    * recent order at-or-before the event time — the enrich-facts-with-
    * latest-dimension-state join (prices, risk scores, account tiers)
    * that q20 solved within ONE table. The classic rewrite: UNION the
    * two sides with a tag instead of range-joining them — order rows
    * carry the payload, event rows carry null — then one (user, time)-
    * ordered running `last(payload, ignoreNulls=true)` window and a
    * filter back to events. One user_id shuffle for the whole join; a
    * range join here is a nested loop (no equi-key on time), and a
    * windowed self-join materializes every (event × order) candidate
    * pair — the union-window plan touches each row exactly once.
    *
    * Order rows sort BEFORE event rows at the same instant (is_event in
    * the sort key), making the match inclusive — exactly DuckDB's
    * `ASOF JOIN … ON e.ts >= o.ts`, which is the oracle: the rewrite is
    * checked against an ENGINE-NATIVE as-of implementation, not a twin
    * of itself. Orders are pre-aggregated to one row per (customer,
    * date) with a deterministic representative (max orderkey), so the
    * at-same-instant winner is pinned in both engines.
    */
  def q43AsofEnrich(
      spark: SparkSession, sfDir: String, ordered: Boolean = true): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      // an order with an unknown customer or an unknown time CANNOT be
      // an as-of anchor — ASOF-join semantics (the oracle's `e.user_id
      // = o.user_id AND e.ts >= o.ots` never matches a NULL). Without
      // this filter the union+window formulation groups NULL users into
      // one window partition and sorts NULL order dates FIRST, silently
      // anchoring every event on a date-less order (r15 advorders catch)
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("ts"))
      .agg(max(col("o_orderkey")).as("anchor_order"))
      .withColumn("is_event", lit(0))
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("is_event", lit(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_event"),
        coalesce(col("event_id"), col("anchor_order")))
      .rowsBetween(Window.unboundedPreceding, 0)
    val enriched = o.unionByName(e, allowMissingColumns = true)
      .withColumn("last_order", last(col("anchor_order"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
        col("last_order"))
    if (ordered) enriched.orderBy(col("event_id")) else enriched
  }

  // ---------------------------------------------------------------- q44
  /** RANGE-frame window — the one frame kind the window family still
    * lacked (q07 unbounded, q20 running, q23 sliding ROWS, q31 offset):
    * each event's trailing-24-hour same-user activity count and value
    * sum, the rate-limiting / velocity feature every abuse and
    * engagement model wants. A ROWS frame counts a fixed number of
    * rows; the RANGE frame is defined by the ORDER-BY VALUE
    * (`[ts−86400 s, ts]`), so bursts widen the frame and quiet periods
    * shrink it — and rows tied on the order value all share one frame in
    * BOTH engines, which makes the result deterministic without a
    * tie-break column. One user_id shuffle; frame bounds are exact
    * integer epoch seconds; the value sum crosses engines as an exact
    * DECIMAL.
    */
  def q44TrailingRate(
      spark: SparkSession, sfDir: String, ordered: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
      .rangeBetween(-86400L, 0L)
    val out = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"),
        epochSeconds(col("ts")).as("es"), col("value"))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_raw", sum(col("value").cast("decimal(38,6)")).over(w))
      .select(col("event_id"), col("user_id"), ntz(col("ts")).as("ts"),
        col("n_24h"), r6(col("sum_raw").cast("double")).as("sum_24h"))
    if (ordered) out.orderBy(col("event_id")) else out
  }

  // ---------------------------------------------------------------- q51
  /** Event-type TRANSITION MATRIX — first-order Markov path analytics
    * (which action follows which): per (prev_type, next_type), the
    * transition count over every user's time-ordered event sequence plus
    * the row-conditional probability p(next | prev). The
    * sequence-analytics deliverable the window family feeds but none of
    * W1–W8 emit: q22 fixes one funnel path, q31 measures time between
    * steps — this measures WHERE the flow goes, the input to funnel
    * discovery, next-action prediction and anomaly-path detection.
    *
    * Scale: the transition pairs come from q31's lag window — ONE
    * user_id shuffle, per-user state is one row. The (prev, next)
    * aggregate collapses map-side to ≤ |types|² rows, and the
    * conditional-probability window runs over that BOUNDED aggregate
    * (the W1 over-aggregate discipline — no unpartitioned window ever
    * sees fact rows). Each user's first event has a NULL prev and drops
    * out identically in both engines; tie order is pinned by
    * (ts, event_id); the probability is one IEEE division r6-rounded.
    */
  def q51TypeTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    counts
      .withColumn("p_transition",
        r6(col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(Window.partitionBy(col("prev_type")))
            .cast("double")))
      .orderBy(col("prev_type"), col("next_type"))
  }

  // ---------------------------------------------------------------- q52
  /** Period-over-period reporting — weekly volume and value mass with
    * the week-over-week delta and percent change: the standing
    * growth-dashboard deliverable (is this week bigger than last?) that
    * q23's trailing average and q50's cohort grid sit beside but don't
    * emit. First week's deltas are NULL (no prior period) in both
    * engines identically.
    *
    * Scale: ONE map-side-combined aggregate collapses the fact scan to
    * the CALENDAR grain (≤ weeks-of-history rows), and the lag window
    * runs over that bounded frame — the q07 over-aggregate window
    * discipline; the value sum is an exact DECIMAL, the percent change
    * one r6-rounded IEEE division against the prior exact count.
    */
  def q52PeriodOverPeriod(spark: SparkSession, sfDir: String): DataFrame = {
    val weekly = Tables.events(spark, sfDir)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(38,6)")).as("tv"))
    val w = Window.orderBy(col("week"))
    weekly
      .withColumn("prev_n", lag(col("n_events"), 1).over(w))
      // timestamp_ntz per the verify protocol — q52 was the ONE query
      // dumping a tz-aware timestamp (every other timestamp output casts
      // ntz), masked until r16 because INT96 dumps read back naive; the
      // TIMESTAMP_MICROS writer surfaces the session zone and the
      // driver's string compare sees "+00:00" where the oracle's
      // date_trunc('week') is a DATE
      .select(col("week").cast("timestamp_ntz").as("week"), col("n_events"),
        r6(col("tv").cast("double")).as("total_value"),
        col("prev_n"),
        (col("n_events") - col("prev_n")).as("delta_n"),
        r6((col("n_events") - col("prev_n")).cast("double") /
          col("prev_n").cast("double")).as("pct_change"))
      .orderBy(col("week"))
  }

  // ---------------------------------------------------------------- q53
  /** EXPLICIT SALTED skew join — the manual form of the skew mitigation
    * the engine otherwise delegates to AQE: the fact side gets a
    * deterministic salt in [0, S) (a row-level hash — the salt only has
    * to SPREAD, not to be portable: it cancels in the aggregate, so the
    * RESULT is salt-invariant and the oracle is the plain join), the dim
    * side replicates S× via explode, and the join runs on
    * (key, salt) — a key that hashes one supplier's entire fact mass
    * onto one task now spreads it across S tasks, at the cost of an
    * S-times-larger (still broadcast-scale) dim.
    *
    * When to reach for this instead of AQE's skew-split: AQE rewrites
    * SORT-MERGE joins from runtime stats AFTER a skewed task is
    * planned; explicit salting is the deterministic pre-planned form
    * that also covers broadcast-side hotspots, stats-blind first runs,
    * and engines/paths AQE doesn't reach (e.g. streaming joins, where
    * no runtime re-plan exists). Partial aggregation still collapses
    * each (group, partition) before the final shuffle, so the extra
    * salt column costs nothing downstream — plan-audited: the join
    * keys carry the salt, the dim side carries the Generate.
    */
  def q53SaltedJoin(spark: SparkSession, sfDir: String,
      saltBuckets: Int = 8): DataFrame = {
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_quantity"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
          lit(saltBuckets.toLong)).as("salt"))
    val dim = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"),
        explode(sequence(lit(0L), lit(saltBuckets - 1L))).as("salt"))
    fact.join(dim,
        fact("l_suppkey") === dim("s_suppkey") && fact("salt") === dim("salt"))
      .groupBy(col("s_name"))
      .agg(dsumr(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
  }

  // ---------------------------------------------------------------- q54
  /** Z-ORDER layout statistics — the data-clustering move lakehouse
    * formats expose as OPTIMIZE ZORDER BY, verified as data: map the
    * event stream onto a (user bucket, hour-of-epoch bucket) grid, key
    * each row by the codegen'd Morton interleave
    * ([[graft.functions.ZOrderKey]]), and aggregate per aligned
    * 4^8-key tile. The mathematics the oracle hash-verifies is the
    * whole point of z-ordering: every tile's extent is ≤ 2^8 in BOTH
    * dimensions (an aligned z-range of size 4^k is a 2^k × 2^k
    * quadtree cell), so a table written
    * `repartitionByRange(zkey).sortWithinPartitions(zkey)` gives
    * file-level min/max skipping on user AND time predicates
    * simultaneously — a single-column sort bounds one and leaves the
    * other spanning the domain. One map pass + one tile-grain
    * aggregate; at 100 TB the stats table is the layout-health feed a
    * nightly OPTIMIZE job reads.
    *
    * Engine↔oracle portability: pmod twins `((a % m) + m) % m`, the
    * epoch-hour division restricted to ts ≥ epoch (truncation ==
    * floor), and the interleave expanded to 32 shift-or terms in the
    * oracle text — bit-exact in both engines.
    */
  def q54ZOrderStats(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .filter(col("ts") >= lit("1970-01-01").cast("timestamp"))
      .select(
        pmod(col("user_id"), lit(65536L)).as("x"),
        pmod(expr("unix_micros(ts) div 3600000000"), lit(65536L)).as("y"))
    e.select(col("x"), col("y"), expr("zorder_key(x, y, 16)").as("zkey"))
      .groupBy(expr("zkey div 65536").as("tile")) // 65536 = 4^8: 256x256 tiles
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("tile").asc_nulls_first)
  }

  /** The oracle's 32-term expansion of [[graft.functions.ZOrderKey]]'s
    * 16-bit interleave — generated from the same constants so a bits
    * retune regenerates both engines.
    */
  private[graft] def zorderOracleExpr(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_zorder_stats" -> (q54ZOrderStats _),
    "q53_salted_join" -> ((s: SparkSession, d: String) => q53SaltedJoin(s, d)),
    "q52_period_over_period" -> (q52PeriodOverPeriod _),
    "q51_type_transitions" -> (q51TypeTransitions _),
    "q44_trailing_rate" -> ((s: SparkSession, d: String) => q44TrailingRate(s, d)),
    "q45_cube_activity" -> (q45CubeActivity _),
    "q47_grouping_sets" -> (q47GroupingSets _),
    "q48_window_ranks" -> (q48WindowRanks _),
    "q49_robust_outliers" -> (q49RobustOutliers _),
    "q50_retention_cohorts" -> (q50RetentionCohorts _),
    "q43_asof_enrich" -> ((s: SparkSession, d: String) => q43AsofEnrich(s, d)),
    "q42_scd2_history" -> ((s: SparkSession, d: String) => q42Scd2(s, d)),
    "q39_union_evolve" -> ((s: SparkSession, d: String) => q39UnionEvolve(s, d)),
    "q41_equidepth_hist" -> ((s: SparkSession, d: String) => q41EquidepthHistogram(s, d)),
    "q38_interval_join" -> (q38IntervalJoin _),
    "q29_approx_sketches" -> (q29ApproxSketches _),
    "q30_bucketed_join" -> (q30BucketedJoin _),
    "q31_event_gaps" -> (q31EventGaps _),
    "q32_moment_stats" -> (q32MomentStats _),
    "q33_intersect_keys" -> (q33IntersectKeys _),
    "q34_date_spine_fill" -> (q34DateSpineFill _),
    "q35_latest_per_key" -> (q35LatestPerKey _),
    "q37_bucketed_gaps" -> (q37BucketedGaps _),
    "q25_inactive_customers" -> (q25InactiveCustomers _),
    "q26_pivot_daily" -> (q26PivotDaily _),
    "q27_rollup_totals" -> (q27RollupTotals _),
    "q28_except_keys" -> (q28ExceptKeys _),
    "q19_percentiles" -> (q19Percentiles _),
    "q21_top_per_group" -> ((s: SparkSession, d: String) => q21TopPerGroup(s, d)),
    "q22_funnel" -> (q22Funnel _),
    "q23_rolling_daily" -> (q23RollingDaily _),
    "q24_json_extract" -> (q24JsonExtract _),
    "q20_asof_anchor" -> (q20AsofAnchor _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_clean_lineitem" -> ((s: SparkSession, d: String) => q02CleanLineitem(s, d)),
    "q03_derived" -> ((s: SparkSession, d: String) => q03Derived(s, d)),
    "q04_label_map" -> (q04LabelMap _),
    "q05_top_parts" -> (q05TopParts _),
    "q06_hourly_avg" -> (q06HourlyAvg _),
    "q07_pct_of_total" -> (q07PctOfTotal _),
    "q08_cond_avg_weekday" -> (q08CondAvgByWeekday _),
    "q09_top_routes" -> (q09TopRoutes _),
    "q10_top_users_enriched" -> (q10TopUsersEnriched _),
    "q11_heatmap" -> (q11Heatmap _),
    "q12_global_metrics" -> (q12GlobalMetrics _),
    "q13_histogram" -> (q13Histogram _),
    "q14_null_census" -> (q14NullCensus _),
    "q15_value_counts" -> (q15ValueCounts _),
    "q16_projection" -> ((s: SparkSession, d: String) => q16Projection(s, d)),
    "q17_removal_accounting" -> (q17RemovalAccounting _),
    "q18_region_rollup" -> (q18RegionRollup _))

  /** Bench-only overrides: the global `orderBy` on the row-level outputs of
    * q02/q03/q16 exists ONLY so the verify harness can hash
    * deterministically — it is not part of the operator. The bench runs the
    * unordered plans so it measures the operator, not the hash protocol.
    */
  val benchOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q02_clean_lineitem" -> ((s: SparkSession, d: String) => q02CleanLineitem(s, d, ordered = false)),
    "q03_derived" -> ((s: SparkSession, d: String) => q03Derived(s, d, ordered = false)),
    "q16_projection" -> ((s: SparkSession, d: String) => q16Projection(s, d, ordered = false)),
    "q39_union_evolve" -> ((s: SparkSession, d: String) => q39UnionEvolve(s, d, ordered = false)),
    "q42_scd2_history" -> ((s: SparkSession, d: String) => q42Scd2(s, d, ordered = false)),
    "q43_asof_enrich" -> ((s: SparkSession, d: String) => q43AsofEnrich(s, d, ordered = false)),
    "q44_trailing_rate" -> ((s: SparkSession, d: String) => q44TrailingRate(s, d, ordered = false)))

  private val dsumSql = (c: String) =>
    s"round(CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE), 6)"
  private val davgSql = (c: String) =>
    s"round(CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) / COUNT($c), 6)"
  private val weekdayCaseSql = (c: String) =>
    s"CASE $c WHEN 'Monday' THEN 1 WHEN 'Tuesday' THEN 2 WHEN 'Wednesday' THEN 3 " +
      s"WHEN 'Thursday' THEN 4 WHEN 'Friday' THEN 5 WHEN 'Saturday' THEN 6 WHEN 'Sunday' THEN 7 END"

  val oracles: Map[String, String] = Map(
    "q54_zorder_stats" ->
      s"""WITH base AS (
         |  SELECT ((user_id % 65536) + 65536) % 65536 AS x,
         |    (((epoch_us(ts) // 3600000000) % 65536) + 65536) % 65536 AS y
         |  FROM events WHERE ts >= TIMESTAMP '1970-01-01'),
         |z AS (SELECT x, y, ${zorderOracleExpr("x", "y", 16)} AS zkey FROM base)
         |SELECT zkey // 65536 AS tile, count(*) AS n,
         |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
         |FROM z GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    // the PLAIN join: the salt is an engine-side spreading device that
    // cancels in the aggregate, so salted and unsalted results must
    // hash-match — which is exactly what this oracle checks
    "q53_salted_join" ->
      s"""SELECT s_name, ${dsumSql("l_quantity")} AS sum_qty,
         |count(*) AS n_items
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name ORDER BY s_name""".stripMargin,
    // Monday-start week trunc (the q50 parity), exact DECIMAL value
    // sum, lag over the bounded weekly frame, r6 percent division
    "q52_period_over_period" ->
      """WITH wk AS (SELECT date_trunc('week', ts) AS week,
        |    count(*) AS n_events,
        |    sum(CAST(value AS DECIMAL(38,6))) AS tv
        |  FROM events GROUP BY 1)
        |SELECT week, n_events,
        |  round(CAST(tv AS DOUBLE) * 1e6) / 1e6 AS total_value,
        |  lag(n_events) OVER (ORDER BY week) AS prev_n,
        |  n_events - lag(n_events) OVER (ORDER BY week) AS delta_n,
        |  round((CAST(n_events - lag(n_events) OVER (ORDER BY week) AS DOUBLE)
        |    / CAST(lag(n_events) OVER (ORDER BY week) AS DOUBLE)) * 1e6) / 1e6
        |    AS pct_change
        |FROM wk ORDER BY week""".stripMargin,
    // the same lag pairing (ties pinned by (ts, event_id)), the same
    // bounded (prev, next) aggregate, the same r6 conditional division
    "q51_type_transitions" ->
      """WITH p AS (SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type AS next_type,
        |    count(*) AS n_transitions
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_transitions,
        |  round((CAST(n_transitions AS DOUBLE)
        |    / CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS DOUBLE))
        |    * 1e6) / 1e6 AS p_transition
        |FROM c ORDER BY prev_type, next_type""".stripMargin,
    "q45_cube_activity" ->
      """SELECT dayname(ts) AS dow, event_type, count(*) AS n
        |FROM events
        |GROUP BY CUBE (dayname(ts), event_type)
        |ORDER BY dow NULLS FIRST, event_type NULLS FIRST, n""".stripMargin,
    // value-defined RANGE frame: tied order values share one frame in
    // both engines, so no tie-break column is needed for determinism
    "q44_trailing_rate" ->
      """SELECT event_id, user_id, ts,
        |  count(*) OVER w AS n_24h,
        |  round(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
        |    * 1e6) / 1e6 AS sum_24h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // the oracle is DuckDB's NATIVE ASOF JOIN — the union-window rewrite
    // is checked against an independent engine implementation of the
    // operator, not a transliteration of itself
    "q43_asof_enrich" ->
      """WITH o AS (SELECT o_custkey AS user_id,
        |  CAST(o_orderdate AS TIMESTAMP) AS ots,
        |  max(o_orderkey) AS anchor_order
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, o.anchor_order AS last_order
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.user_id AND e.ts >= o.ots
        |ORDER BY e.event_id""".stripMargin,
    // identical lag-filter-lead formulation; tie order pinned by event_id
    "q42_scd2_history" ->
      """WITH o AS (SELECT user_id, ts, event_type, event_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT user_id, event_type, ts, event_id
        |  FROM o WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM v
        |ORDER BY user_id NULLS FIRST, valid_from, event_type, valid_to NULLS FIRST""".stripMargin,
    // by-name union with null fill — the oracle spells the generations'
    // projections and the missing-column nulls explicitly
    "q39_union_evolve" ->
      """SELECT event_id, ts, user_id, event_type,
        |  CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS props
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, ts, user_id, event_type, value, props
        |FROM events WHERE event_id % 2 = 1
        |ORDER BY event_id""".stripMargin,
    // the NAIVE global-row_number formulation is the oracle; the
    // distributed two-phase rank must reproduce it row-for-row
    "q41_equidepth_hist" ->
      """WITH t AS (SELECT l_extendedprice AS p, l_orderkey AS k,
        |                  l_linenumber AS ln FROM lineitem),
        |n AS (SELECT count(*) AS total FROM t),
        |r AS (SELECT p,
        |  CAST(((row_number() OVER (ORDER BY p, k, ln) - 1) * 10) // total
        |       AS BIGINT) AS bin_id
        |  FROM t, n)
        |SELECT bin_id, count(*) AS n_rows,
        |  min(p) AS min_price, max(p) AS max_price
        |FROM r GROUP BY bin_id ORDER BY bin_id""".stripMargin,
    // the NAIVE range-predicate join is the oracle; the engine's
    // day-binned equi-join rewrite must reproduce it row-for-row
    "q38_interval_join" ->
      s"""WITH w AS (SELECT i AS campaign_id,
         |  TIMESTAMP '2024-01-01 06:00:00' + to_days(CAST(3 * i AS INTEGER)) AS start_ts,
         |  TIMESTAMP '2024-01-01 06:00:00' + to_days(CAST(3 * i AS INTEGER))
         |    + to_hours(108) AS end_ts
         |  FROM range(10) t(i))
         |SELECT w.campaign_id, count(*) AS n_events,
         |  count(DISTINCT e.user_id) AS n_users,
         |  ${dsumSql("e.value")} AS sum_value
         |FROM events e JOIN w ON e.ts >= w.start_ts AND e.ts < w.end_ts
         |GROUP BY w.campaign_id ORDER BY w.campaign_id""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${dsumSql("l_quantity")} AS sum_qty,
         |${dsumSql("l_extendedprice")} AS sum_base_price,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |${davgSql("l_quantity")} AS avg_qty,
         |${davgSql("l_extendedprice")} AS avg_price,
         |${davgSql("l_discount")} AS avg_disc,
         |count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_clean_lineitem" ->
      s"""SELECT ${lineitemCols.mkString(", ")} FROM lineitem
         |WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
         |  AND l_extendedprice IS NOT NULL AND l_shipdate IS NOT NULL
         |  AND l_quantity > 0 AND l_extendedprice > 0
         |  AND l_extendedprice <= 100000 AND l_discount BETWEEN 0.0 AND 1.0
         |ORDER BY ${lineitemCols.mkString(", ")}""".stripMargin,
    "q03_derived" ->
      """SELECT l_orderkey, l_linenumber,
        |round((epoch(l_shipdate) - epoch(o_orderdate)) / 86400.0, 6) AS ship_delay_days,
        |dayname(l_shipdate) AS ship_dow,
        |round(CASE WHEN (epoch(l_shipdate) - epoch(o_orderdate)) / 86400.0 > 0
        |  THEN l_quantity / ((epoch(l_shipdate) - epoch(o_orderdate)) / 86400.0)
        |  ELSE 0.0 END, 6) AS qty_per_day
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber,
        |  ship_delay_days NULLS FIRST, qty_per_day NULLS FIRST""".stripMargin,
    "q04_label_map" ->
      """SELECT CASE l_returnflag WHEN 'A' THEN 'Accepted' WHEN 'N' THEN 'None'
        |  WHEN 'R' THEN 'Returned' END AS returnflag_label, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_top_parts" ->
      """SELECT p_name, count(*) AS total_trips
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_name ORDER BY total_trips DESC, p_name LIMIT 10""".stripMargin,
    "q06_hourly_avg" ->
      s"""SELECT hour(ts) AS event_hour, ${davgSql("value")} AS avg_value,
         |count(*) AS n_events
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_pct_of_total" ->
      """SELECT event_type, count(*) AS n,
        |round(count(*) * 100.0 / SUM(count(*)) OVER (), 6) AS percentage
        |FROM events GROUP BY event_type
        |ORDER BY percentage DESC, event_type NULLS FIRST""".stripMargin,
    "q08_cond_avg_weekday" ->
      s"""SELECT dayname(l_shipdate) AS ship_dow,
         |round(CAST(SUM(CAST(CASE WHEN l_quantity > 0 THEN l_discount END AS DECIMAL(38,6))) AS DOUBLE)
         |  / COUNT(CASE WHEN l_quantity > 0 THEN l_discount END) * 100, 6) AS avg_disc_pct
         |FROM lineitem WHERE l_returnflag = 'R'
         |GROUP BY 1 ORDER BY ${weekdayCaseSql("ship_dow")}""".stripMargin,
    "q09_top_routes" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation, count(*) AS route_count
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2 ORDER BY route_count DESC, cust_nation, supp_nation LIMIT 5""".stripMargin,
    "q10_top_users_enriched" ->
      """SELECT user_id, n_events, c_name
        |FROM (SELECT user_id, count(*) AS n_events FROM events
        |      GROUP BY 1 ORDER BY n_events DESC, user_id LIMIT 10) t
        |LEFT JOIN customer ON t.user_id = customer.c_custkey
        |ORDER BY n_events ASC, user_id""".stripMargin,
    "q11_heatmap" ->
      s"""SELECT dayname(ts) AS day_of_week, hour(ts) AS event_hour, count(*) AS n
         |FROM events GROUP BY 1, 2
         |ORDER BY ${weekdayCaseSql("day_of_week")}, event_hour""".stripMargin,
    "q12_global_metrics" ->
      s"""SELECT count(*) AS n_events, ${davgSql("value")} AS avg_value,
         |${dsumSql("value")} AS total_value,
         |CAST(floor(epoch(min(ts))) AS BIGINT) AS min_ts_epoch,
         |CAST(floor(epoch(max(ts))) AS BIGINT) AS max_ts_epoch
         |FROM events""".stripMargin,
    "q13_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bin, count(*) AS n
        |FROM lineitem WHERE l_extendedprice > 0 AND l_extendedprice < 100000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_null_census" ->
      lineitemCols.map(c => s"count(*) - count($c) AS ${c}_nulls")
        .mkString("SELECT ", ", ", " FROM lineitem"),
    "q15_value_counts" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type NULLS FIRST""".stripMargin,
    "q16_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin,
    "q17_removal_accounting" -> {
      val p0 = "(l_orderkey IS NOT NULL AND l_quantity IS NOT NULL AND " +
        "l_extendedprice IS NOT NULL AND l_shipdate IS NOT NULL)"
      val p1 = "coalesce(l_quantity > 0, FALSE)"
      val p2 = "coalesce(l_extendedprice > 0, FALSE)"
      val p3 = "coalesce(l_extendedprice <= 100000, FALSE)"
      val p4 = "coalesce(l_discount BETWEEN 0.0 AND 1.0, FALSE)"
      s"""SELECT count(*) AS rows_in,
         |count(CASE WHEN NOT $p0 THEN 1 END) AS removed_nulls,
         |count(CASE WHEN $p0 AND NOT $p1 THEN 1 END) AS removed_quantity,
         |count(CASE WHEN $p0 AND $p1 AND NOT $p2 THEN 1 END) AS removed_price_pos,
         |count(CASE WHEN $p0 AND $p1 AND $p2 AND NOT $p3 THEN 1 END) AS removed_price_cap,
         |count(CASE WHEN $p0 AND $p1 AND $p2 AND $p3 AND NOT $p4 THEN 1 END) AS removed_discount,
         |count(CASE WHEN $p0 AND $p1 AND $p2 AND $p3 AND $p4 THEN 1 END) AS rows_out
         |FROM lineitem""".stripMargin
    },
    "q18_region_rollup" ->
      s"""SELECT r_name, count(*) AS n_customers, ${davgSql("c_acctbal")} AS avg_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q20_asof_anchor" ->
      """WITH a AS (SELECT event_id, user_id, ts,
        |  last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS anchor_ts
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |  CAST(floor(epoch(anchor_ts)) AS BIGINT) AS anchor_sec,
        |  CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(anchor_ts)) AS BIGINT) AS since_anchor_sec
        |FROM a ORDER BY event_id""".stripMargin,
    "q25_inactive_customers" ->
      s"""SELECT c_mktsegment, count(*) AS n_inactive,
         |${davgSql("c_acctbal")} AS avg_acctbal
         |FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q26_pivot_daily" ->
      s"""SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
         |${EventTypes.map(t => s"""count(CASE WHEN event_type = '$t' THEN 1 END) AS "$t"""").mkString(",\n")}
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    // med/mad are group constants — max() fetches them identically in
    // both engines; the fence compare runs on unrounded doubles
    "q49_robust_outliers" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |d AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
        |  FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY 1)
        |SELECT d.event_type, count(*) AS n,
        |  round(max(d.med) * 1e6) / 1e6 AS med_value,
        |  round(max(md.mad) * 1e6) / 1e6 AS mad_value,
        |  CAST(sum(CASE WHEN d.dev > 3.0 * md.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // date_trunc('week', ts) is Monday-start in both engines; (user, week)
    // rows are unique after the DISTINCT so count(*) is the distinct-user
    // count, and the offset-0 cell is each cohort's size by construction
    "q50_retention_cohorts" ->
      """WITH wk AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        |  FROM events),
        |c AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY user_id),
        |g AS (SELECT c.cohort,
        |    CAST(date_diff('day', c.cohort, wk.week) / 7 AS BIGINT) AS week_offset,
        |    count(*) AS n_active
        |  FROM wk JOIN c USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort, week_offset, n_active,
        |    first_value(n_active) OVER (PARTITION BY cohort ORDER BY week_offset)
        |      AS cohort_size
        |  FROM g)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort_week, week_offset,
        |  n_active, cohort_size,
        |  round(n_active * 100.0 / cohort_size * 1e6) / 1e6 AS retention_pct
        |FROM s
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q48_window_ranks" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice + 0.0 AS o_totalprice,
        |  CAST(ntile(10) OVER w AS BIGINT) AS decile,
        |  round(percent_rank() OVER w * 1e6) / 1e6 AS pct_rank,
        |  round(cume_dist() OVER w * 1e6) / 1e6 AS cum_dist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice NULLS FIRST, o_orderkey NULLS FIRST)
        |ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST,
        |  o_totalprice NULLS FIRST, decile, pct_rank, cum_dist""".stripMargin,
    "q47_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n_items,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q27_rollup_totals" ->
      s"""SELECT r_name, n_name, count(*) AS n_customers,
         |${dsumSql("c_acctbal")} AS sum_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q28_except_keys" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT user_id AS custkey FROM events
        |ORDER BY custkey NULLS FIRST""".stripMargin,
    "q21_top_per_group" ->
      s"""WITH r AS (SELECT n_name, s_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  GROUP BY 1, 2),
         |k AS (SELECT n_name, s_name, revenue,
         |  row_number() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_name) AS rk
         |  FROM r)
         |SELECT n_name, s_name, revenue, rk FROM k WHERE rk <= 3
         |ORDER BY n_name, rk""".stripMargin,
    "q22_funnel" ->
      """WITH a AS (SELECT user_id, event_type, ts,
        |  min(CASE WHEN event_type = 'view' THEN ts END)
        |    OVER (PARTITION BY user_id) AS s1 FROM events),
        |b AS (SELECT user_id, event_type, ts, s1,
        |  min(CASE WHEN event_type = 'click' AND ts >= s1
        |           AND ts <= s1 + INTERVAL 24 HOURS THEN ts END)
        |    OVER (PARTITION BY user_id) AS s2 FROM a),
        |c AS (SELECT user_id, s1, s2,
        |  min(CASE WHEN event_type = 'purchase' AND ts >= s2
        |           AND ts <= s2 + INTERVAL 24 HOURS THEN ts END)
        |    OVER (PARTITION BY user_id) AS s3 FROM b),
        |u AS (SELECT user_id, min(s1) AS u1, min(s2) AS u2, min(s3) AS u3
        |  FROM c GROUP BY user_id)
        |SELECT count(*) AS n_users, count(u1) AS n_view,
        |  count(u2) AS n_click_after_view, count(u3) AS n_purchase_after_click,
        |  round(count(u3) * 100.0 / count(u1) * 1e6) / 1e6 AS conversion_pct
        |FROM u""".stripMargin,
    "q23_rolling_daily" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(day AS TIMESTAMP) AS day, n,
        |  round(CAST(sum(n) OVER w AS DOUBLE) / count(n) OVER w * 1e6) / 1e6 AS ma7
        |FROM d
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type NULLS FIRST, day""".stripMargin,
    // the strict-JSON twin of json_first_long (see its scaladoc): yyjson
    // validity + the raw-rendering integer regex (strings stay quoted,
    // decimals keep their point) + TRY_CAST's NULL on long overflow
    "q24_json_extract" ->
      """WITH e AS (SELECT event_type,
        |  CASE WHEN json_valid(props)
        |       AND regexp_matches(CAST(json_extract(props, '$.k') AS VARCHAR),
        |                          '^-?[0-9]+$')
        |    THEN TRY_CAST(CAST(json_extract(props, '$.k') AS VARCHAR) AS BIGINT)
        |  END AS k FROM events)
        |SELECT event_type, count(*) AS n_events, count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
        |  round(CAST(sum(k) AS DOUBLE) / count(k) * 1e6) / 1e6 AS avg_k
        |FROM e GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin,
    "q30_bucketed_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""".stripMargin,
    // identical rows to q31 — the bucketed staging changes the PLAN, not
    // the result
    "q37_bucketed_gaps" ->
      """WITH g AS (SELECT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |  lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  count(ts_sec - prev_sec) AS n_gaps,
        |  round(CAST(sum(ts_sec - prev_sec) AS DOUBLE)
        |    / count(ts_sec - prev_sec) * 1e6) / 1e6 AS avg_gap_sec,
        |  max(ts_sec - prev_sec) AS max_gap_sec
        |FROM g GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,
    "q31_event_gaps" ->
      """WITH g AS (SELECT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |  lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  count(ts_sec - prev_sec) AS n_gaps,
        |  round(CAST(sum(ts_sec - prev_sec) AS DOUBLE)
        |    / count(ts_sec - prev_sec) * 1e6) / 1e6 AS avg_gap_sec,
        |  max(ts_sec - prev_sec) AS max_gap_sec
        |FROM g GROUP BY user_id ORDER BY user_id NULLS FIRST""".stripMargin,
    "q32_moment_stats" -> {
      val dsum = (c: String) => s"CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE)"
      s"""WITH s AS (SELECT l_returnflag, count(*) AS n,
         |  ${dsum("l_quantity")} AS sx,
         |  ${dsum("l_discount")} AS sy,
         |  ${dsum("l_quantity * l_quantity")} AS sxx,
         |  ${dsum("l_discount * l_discount")} AS syy,
         |  ${dsum("l_quantity * l_discount")} AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  round(sx / n * 1e6) / 1e6 AS mean_qty,
         |  round(sqrt((sxx - sx * sx / n) / n) * 1e6) / 1e6 AS stddev_qty,
         |  round((sxy - sx * sy / n)
         |    / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) * 1e6) / 1e6
         |    AS corr_qty_disc
         |FROM s ORDER BY l_returnflag""".stripMargin
    },
    "q33_intersect_keys" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT user_id AS custkey FROM events
        |ORDER BY custkey NULLS FIRST""".stripMargin,
    "q34_date_spine_fill" ->
      """WITH b AS (SELECT min(CAST(ts AS DATE)) AS dmin, max(CAST(ts AS DATE)) AS dmax
        |           FROM events),
        |spine AS (SELECT unnest(generate_series(b.dmin, b.dmax, INTERVAL 1 DAY)) AS day
        |          FROM b),
        |grid AS (SELECT t.event_type, s.day
        |         FROM (SELECT DISTINCT event_type FROM events) t, spine s),
        |d AS (SELECT event_type, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n
        |      FROM events GROUP BY 1, 2)
        |SELECT g.event_type, g.day, coalesce(d.n, 0) AS n
        |FROM grid g LEFT JOIN d ON g.event_type = d.event_type AND g.day = d.day
        |ORDER BY g.event_type NULLS FIRST, g.day""".stripMargin,
    "q35_latest_per_key" ->
      """WITH r AS (SELECT user_id, ts, event_type, value, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |SELECT user_id, ts, event_type, value, event_id
        |FROM r WHERE rk = 1 ORDER BY user_id NULLS FIRST""".stripMargin,
    "q19_percentiles" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(quantile_cont(l_quantity, 0.25) * 1e6) / 1e6 AS p25,
        |  round(quantile_cont(l_quantity, 0.5) * 1e6) / 1e6 AS p50,
        |  round(quantile_cont(l_quantity, 0.75) * 1e6) / 1e6 AS p75,
        |  round(quantile_cont(l_quantity, 0.95) * 1e6) / 1e6 AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
