package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Payment-lifecycle analytics — the reference's domain re-expressed
  * as distributed Spark operators (see SURVEY.md §2A).
  *
  * Determinism/oracle rules (SURVEY.md §6): money is cast to
  * DECIMAL(12,2) *before* arithmetic so every intermediate is exact in
  * both Spark and DuckDB; final aggregates are cast to DOUBLE (same
  * bits both engines). Event time is compared at floor-second
  * granularity (`cast(ts as long)` ⇔ `epoch_us(ts)//1000000`), and
  * window orderings always tie-break on a unique id.
  *
  * Scale notes are on each operator — all are single-shuffle,
  * partial-agg-friendly shapes that hold at 100 TB.
  */
object Payments {

  private val dec = "decimal(12,2)"

  /** Symbol of any event: KAU for even event_id, KAG for odd — the
    * deterministic stand-in for the reference's currency field
    * (kinesis-pay.php:468-485). THE single definition: every batch
    * operator and the streaming enrichment derive the symbol from
    * here (the oracle SQL mirrors it as a CASE expression).
    */
  private[graft] def currencyOf: org.apache.spark.sql.Column =
    when(col("event_id") % 2 === 0, "KAU").otherwise("KAG")

  /** The rate-tick stream: click events with a VALID quote. value=0
    * ticks are invalid (and would divide-by-zero under ANSI) —
    * excluded here so every consumer (as-of carry-forward, OHLC,
    * streaming enrichment) agrees on what a tick is.
    */
  private[graft] def ticksOf(events: DataFrame): DataFrame =
    events.where(col("event_type") === "click" && col("value") =!= 0)
      .withColumn("currency", currencyOf)

  /** Flagship pricing summary (TPC-H Q1 shape): shipped-lineitem
    * status report with exact decimal money math. Scan → filter
    * (pushed to parquet) → 6-group hash aggregate with map-side
    * partials; the canonical 100 TB-friendly plan (one shuffle of 6
    * partial rows per task). Averages are computed as exact decimal
    * sums divided as doubles so Spark and the DuckDB oracle agree
    * bit-for-bit.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-02"): DataFrame =
    lineitem
      .where(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        // Money sums are rounded to scale 2 BEFORE the double cast:
        // (a) money semantics, (b) it keeps the unscaled value far
        // below 2^53 — DuckDB's int128-decimal → double cast rounds
        // through two steps and is off by an ulp past that (observed
        // at sf0.1), while scale-2 sums cast exactly in both engines.
        round(sum(col("l_extendedprice").cast(dec) *
          (lit(1).cast(dec) - col("l_discount").cast("decimal(4,3)"))), 2)
          .cast("double").as("sum_disc_price"),
        // (1-d)*(1+t) folded first at exact scale 6: the naive 3-way
        // product needs precision 40 and triggers Spark's >38
        // precision-loss rounding.
        round(sum(col("l_extendedprice").cast(dec) *
          ((lit(1).cast(dec) - col("l_discount").cast("decimal(4,3)")) *
            (lit(1).cast(dec) + col("l_tax").cast("decimal(4,3)")))
            .cast("decimal(8,6)")), 2)
          .cast("double").as("sum_charge"),
        (sum(col("l_quantity").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"),
        (sum(col("l_extendedprice").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** Latest-state resolution per entity — the poll loop's terminal
    * status (kinesis-pay.php:239-249). One shuffle on the entity key;
    * rank-window, never a global sort.
    */
  def latestStatus(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"),
        col("event_type").as("last_status"),
        col("event_id").as("last_event_id"))
  }

  /** Per-day lifecycle funnel: counts + exact money totals by status. */
  def funnel(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))

  /** 10-minute expiry semantics (kinesis-pay.php:210,264-268): each
    * purchase is matched to the user's most recent prior signup; within
    * `expirySec` → processed, later → expired, no signup → orphan.
    * Carried-forward state via an ignore-nulls last() window — one
    * shuffle on user_id, no self-join, no range explosion.
    */
  def expiryOutcomes(events: DataFrame, expirySec: Long = 600): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = events
      .where(col("event_type").isin("signup", "purchase"))
      .withColumn("ts_sec", col("ts").cast("long"))
      .withColumn("last_signup_sec",
        last(when(col("event_type") === "signup", col("ts").cast("long")),
          ignoreNulls = true).over(w))
    flagged
      .where(col("event_type") === "purchase")
      .withColumn("status",
        when(col("last_signup_sec").isNull, "orphan")
          .when(col("ts_sec") - col("last_signup_sec") <= expirySec, "processed")
          .otherwise("expired"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))
  }

  /** FSM transition matrix: lag() per user → (prev,curr) counts. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("curr_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Gap-based sessionization (gaps-and-islands): a new session starts
    * when the gap exceeds `gapSec`. Two window passes over one
    * user_id shuffle; equivalent to `session_window` grouping but
    * expressed so the DuckDB oracle is identical.
    */
  def sessionStats(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sessions = events
      .withColumn("ts_sec", col("ts").cast("long"))
      .withColumn("prev_sec", lag(col("ts_sec"), 1).over(wo))
      .withColumn("new_sess",
        when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("sess_id",
        sum(col("new_sess")).over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("sess_events"))
    sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("sess_events")).as("n_events"),
        max(col("sess_events")).as("max_session_events"))
  }

  /** Deterministic every-Nth sampling (the reference logs every 10th
    * poll, kinesis-pay.php:303). Partition-local — no shuffle for the
    * filter itself, unlike orderBy+limit sampling.
    */
  def pollSample(events: DataFrame, n: Int = 10): DataFrame =
    events
      .where(col("event_id") % n === 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("total_value"))

  /** Percentage price adjustment with 2-dp money rounding
    * (kinesis-pay.php:137-140). Pure projection — no shuffle.
    */
  def priceAdjust(orders: DataFrame, pct: String = "0.85"): DataFrame =
    orders.selectExpr(
      "o_orderkey",
      s"CAST(ROUND(CAST(o_totalprice AS $dec) * CAST($pct AS DECIMAL(3,2)), 2) AS DOUBLE) AS adj_total")

  /** First vs recurring payment split (first_total/second_total,
    * kinesis-pay.php:138): window-min per customer, then aggregate.
    */
  def firstVsRebill(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    orders
      .withColumn("rn", row_number().over(w))
      .withColumn("pay_class", when(col("rn") === 1, "first").otherwise("rebill"))
      .groupBy("pay_class")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))
  }

  /** Manual-rebill schedule: next due date per customer = last order
    * date + `days` (Am_Paysystem_ManualRebill semantics).
    */
  def rebillDue(orders: DataFrame, days: Int = 30): DataFrame =
    orders
      .groupBy("o_custkey")
      .agg(max(col("o_orderdate")).as("last_ts"))
      .select(col("o_custkey"),
        to_date(col("last_ts")).as("last_order_date"),
        date_add(to_date(col("last_ts")), days).as("due_date"))

  /** Free-trial bypass split (total ≤ threshold routes around the
    * gateway, kinesis-pay.php:124-128).
    */
  def freeTrialSplit(orders: DataFrame, threshold: String = "5000"): DataFrame =
    orders
      .withColumn("tier",
        when(col("o_totalprice").cast(dec) < expr(s"CAST($threshold AS $dec)"), "free_tier")
          .otherwise("paid"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))

  /** As-of join: each purchase gets the most recent prior exchange-rate
    * tick *for its currency* (kinesis-pay.php:468-485 orderbook bid,
    * one book per KAU/KAG pair). **Time-bucketed carry-forward** so
    * parallelism is symbols × time-buckets, never bounded by symbol
    * cardinality (a currency pair has exactly 2 symbols here — a plain
    * partition-by-currency window would be a 2-task sort at any
    * cluster size):
    *
    *  1. every tick/purchase is assigned a `bucketSec`-wide time bucket;
    *     the carry-forward window runs WITHIN (currency, bucket) — the
    *     event-sized sort shuffles on a high-cardinality composite key;
    *  2. a per-(currency, bucket) spine (one aggregated row per bucket
    *     that has any event — orders of magnitude smaller than the
    *     events) computes each bucket's closing tick and carries it
    *     across buckets (including tickless ones) with a
    *     strictly-preceding window, partitioned by currency only — safe
    *     because this frame is already aggregate-sized, the same
    *     small-frame argument as the global top-k rank;
    *  3. the carry-in joins back on (currency, bucket) — co-partitioned
    *     with the window shuffle, and broadcast-sized in practice — and
    *     each purchase resolves coalesce(within-bucket rate, carry-in).
    *
    * Identical semantics to the single-window formulation (the oracle
    * SQL is still the plain carry-forward); no range-join explosion, no
    * global sort, no low-cardinality sort stage over event-sized data.
    */
  def xrateAsof(events: DataFrame, bucketSec: Long = 86400): DataFrame = {
    val ticks = ticksOf(events)
      .select(col("currency"), col("ts"), col("event_id"),
        lit(null).cast("double").as("paid"),
        col("value").as("rate"), lit(0).as("is_purchase"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(currencyOf.as("currency"), col("ts"), col("event_id"),
        col("value").as("paid"),
        lit(null).cast("double").as("rate"), lit(1).as("is_purchase"))
    val u = ticks.unionByName(purchases)
      .withColumn("bucket", floor(col("ts").cast("long") / lit(bucketSec)))
    // 1) within-bucket carry-forward: high-cardinality composite key
    val wIn = Window.partitionBy("currency", "bucket")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = u.withColumn("bucket_rate",
      last(col("rate"), ignoreNulls = true).over(wIn))
    // 2) bucket spine: closing tick per bucket, carried forward from
    // strictly earlier buckets (tickless buckets inherit; close_rate is
    // null only for them, so ignoreNulls last() skips them correctly).
    // Deliberately re-aggregates the raw union rather than consuming
    // the windowed frame: exchange reuse does NOT fire across the two
    // branches either way (column pruning gives them different
    // exchange schemas), and a partial-agg over the pruned scan is far
    // cheaper than replaying the sort+window. Cost at scale = two
    // extra column-pruned, filter-pushed scans for the aggregate-sized
    // spine.
    val spine = u.groupBy("currency", "bucket")
      .agg(max_by(when(col("is_purchase") === 0 && col("rate").isNotNull,
        col("rate")),
        // purchases AND null-rate ticks sort below any real tick, so the
        // closing rate is the latest NON-NULL tick — matching the
        // single-window ignoreNulls semantics even if a tick arrived
        // with a null rate (unreachable with current data, but the
        // bucket spine must not diverge on it)
        struct(col("is_purchase") === 0 && col("rate").isNotNull,
          col("ts"), col("event_id")))
        .as("close_rate"))
    val wCarry = Window.partitionBy("currency").orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.withColumn("carry_in",
      last(col("close_rate"), ignoreNulls = true).over(wCarry))
      .select(col("currency").as("cc"), col("bucket").as("cb"), col("carry_in"))
    // 3) resolve: within-bucket rate if any tick preceded the purchase
    // in its own bucket, else the last closing rate of an earlier bucket
    inBucket.join(carry,
        col("currency") === col("cc") && col("bucket") === col("cb"))
      .withColumn("cur_rate", coalesce(col("bucket_rate"), col("carry_in")))
      .where(col("is_purchase") === 1 && col("cur_rate").isNotNull)
      .select(col("event_id"), col("currency"), col("cur_rate").as("rate"),
        (col("paid") / col("cur_rate")).as("pay_amount"))
  }

  /** Daily OHLC (open/high/low/close) per currency over the rate
    * ticks — the summary view of the reference's orderbook feed
    * (kinesis-pay.php:468-485): open/close are min_by/max_by on the
    * (ts, event_id) composite — deterministic under ts ties —
    * high/low/count as plain aggregates.
    *
    * Scale shape: ONE partial-aggregated groupBy — every aggregate
    * (including the argmin/argmax) combines map-side, so the exchange
    * moves one row per (currency, day), never the raw ticks (a
    * row_number formulation would shuffle and twice-sort every tick —
    * plan-audit-asserted absent; the struct-keyed min_by does plan as
    * SortAggregate, a map-side group-key sort, which still beats
    * shipping ticks). The oracle
    * keeps an equivalent row_number form purely because DuckDB 1.0's
    * arg_min cannot take a composite key — same values either way.
    * Raw double rates pass through un-arithmetic'd, so min/max are
    * bit-stable across engines.
    */
  def rateOhlc(events: DataFrame): DataFrame =
    ticksOf(events)
      .select(col("currency"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), col("value"))
      .groupBy("currency", "day")
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open_rate"),
        max(col("value")).as("high_rate"),
        min(col("value")).as("low_rate"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close_rate"),
        count(lit(1)).as("n_ticks"))

  /** Currency-conditional amount resolution (KAU/KAG pick,
    * kinesis-pay.php:507-509) with exact decimal arithmetic.
    */
  /** KAU pays 0.9, KAG 1.1 — derived from the shared [[currencyOf]]
    * symbol so the even/odd rule lives in one place.
    */
  private def currencyMultiplier: org.apache.spark.sql.Column =
    when(col("currency") === "KAU", lit(0.9).cast("decimal(2,1)"))
      .otherwise(lit(1.1).cast("decimal(2,1)"))

  def amountPaid(events: DataFrame): DataFrame =
    events.where(col("event_type") === "purchase")
      .withColumn("currency", currencyOf)
      .select(col("currency"),
        (col("value").cast(dec) * currencyMultiplier).as("amt"))
      .groupBy("currency")
      .agg(count(lit(1)).as("n"), sum(col("amt")).cast("double").as("total_paid"))

  /** Multi-level revenue rollup over the dim hierarchy. Dims are
    * broadcast (small); rollup is one shuffle with partial aggs.
    */
  def revenueRollup(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))

  /** Daily/rolling active users: distinct users per day. Exact
    * distinct (Spark expands it to a two-phase aggregate) keeps the
    * oracle bit-exact; `approx = true` is the 100 TB swap — HLL++
    * (`approx_count_distinct`, rsd 2%) aggregates in ONE shuffle of
    * constant-size sketches instead of the exact form's expanded
    * two-phase distinct, at the cost of the documented error bound
    * (spec-asserted ≤ 5% against exact at sf0.01).
    */
  def activeUsers(events: DataFrame, approx: Boolean = false): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        (if (approx) approx_count_distinct(col("user_id"), 0.02)
         else countDistinct(col("user_id"))).as("dau"),
        count(lit(1)).as("n_events"))

  /** Cohort retention: users grouped by first-seen week, counted as
    * active per weeks-since-cohort offset. First-seen via one min-agg
    * (not a window over raw events), then a broadcast-sized cohort
    * map joins back to the distinct (user, week) activity — two keyed
    * shuffles total, both on user_id.
    */
  def retention(events: DataFrame, maxWeeks: Int = 8): DataFrame = {
    val weeks = events.select(col("user_id"),
      floor(col("ts").cast("long") / lit(604800L)).as("week"))
    val firstSeen = weeks.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    weeks.distinct()
      .join(firstSeen, "user_id")
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .where(col("week_offset") <= maxWeeks)
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Shipping-priority report (TPC-H Q3 shape): segment-filtered
    * customers ⨝ undelivered orders ⨝ lineitems, revenue per order,
    * top-k by revenue. Dims broadcast after pushdown filters; one agg
    * shuffle; global top-k via rank on the (small) aggregated set.
    */
  def shipPriority(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, segment: String = "BUILDING",
      cutoff: String = "1998-03-15", k: Int = 10): DataFrame = {
    val rev = lineitem
      .where(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .join(orders.where(col("o_orderdate") < lit(cutoff).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.where(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .agg(sum(col("l_extendedprice").cast(dec) *
        (lit(1).cast(dec) - col("l_discount").cast("decimal(4,3)")))
        .as("rev_d"))
    val w = Window.orderBy(col("rev_d").desc, col("l_orderkey"))
    rev.withColumn("rnk", rank().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("l_orderkey"), col("order_date"),
        col("rev_d").cast("double").as("revenue"), col("rnk"))
  }

  /** Order-priority check (TPC-H Q4 shape): orders in a date window
    * with at least one late lineitem — left-semi join (existence, no
    * fan-out), counts by priority.
    */
  def orderPriority(orders: DataFrame, lineitem: DataFrame,
      from: String = "1996-01-01", to: String = "1996-04-01"): DataFrame =
    orders
      .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(to).cast("timestamp"))
      .join(lineitem.where(col("l_linenumber") % 3 === 0),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  /** Regional order volume (TPC-H Q5 shape): 4-way dim chain over the
    * fact, exact revenue per (region, nation). All dims broadcast —
    * the fact never shuffles before the aggregate.
    */
  def regionVolume(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame,
      from: String = "1996-01-01", to: String = "1997-01-01"): DataFrame =
    orders
      .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(to).cast("timestamp"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("volume"))

  /** Full-cube revenue view over (region, status): every grouping-set
    * combination in one pass — same single-shuffle partial-agg shape
    * as the rollup, 4× the output groups.
    */
  def revenueCube(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))

  /** Exact value percentiles per event type (payment-size
    * distribution for ops dashboards): exact linear-interpolated
    * percentile keeps the DuckDB oracle bit-exact; `approx = true` is
    * the 100 TB swap — `approx_percentile` (Greenwald-Khanna, accuracy
    * 10000) holds a bounded-size summary per group instead of
    * buffering every value for the exact sort-bearing aggregate
    * (spec-asserted ≤ 5% relative error against exact at sf0.01).
    */
  def valueQuantiles(events: DataFrame, approx: Boolean = false): DataFrame = {
    val fn = if (approx) "approx_percentile" else "percentile"
    val acc = if (approx) ", 10000" else ""
    events
      .groupBy("event_type")
      .agg(
        round(expr(s"$fn(value, 0.5$acc)"), 6).as("p50"),
        round(expr(s"$fn(value, 0.9$acc)"), 6).as("p90"),
        round(expr(s"$fn(value, 0.99$acc)"), 6).as("p99"))
  }

  /** Top-k customers per nation by exact revenue; rank-window on one
    * shuffle, deterministic tie-break on custkey.
    */
  def topCustomers(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, k: Int = 3): DataFrame = {
    val rev = orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_custkey")
      .agg(sum(col("o_totalprice").cast(dec)).as("rev_d"))
    val w = Window.partitionBy("n_name").orderBy(col("rev_d").desc, col("c_custkey"))
    rev.withColumn("rnk", rank().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("n_name"), col("c_custkey"),
        col("rev_d").cast("double").as("revenue"), col("rnk"))
  }

  /** Invoice↔customer↔nation reconciliation (the reference's invoice
    * lookup + logging, kinesis-pay.php:291-299,446-462): per-nation
    * order counts, exact revenue, distinct paying customers.
    */
  def invoiceReconcile(orders: DataFrame, customer: DataFrame,
      nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"))

  /** Unmatched detection: customers with no orders since `since`
    * (churned) — left-anti join against the filtered fact (filter
    * pushed to the scan; no distinct-then-join, no null-safe traps).
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
      nation: DataFrame, since: String = "1998-01-01"): DataFrame =
    customer
      .join(orders.where(col("o_orderdate") >= lit(since).cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))

  /** Payment-confirmation amount recording (kinesis-pay.php:487-510,
    * approvePayment): resolve the paid amount by currency and persist
    * it in the reference's `"<amount> <currency>"` AMOUNT_PAID format.
    * Pure projection on the purchase stream — zero shuffle; the
    * formatted string is produced from a scale-2 DECIMAL so both
    * engines render identical text.
    */
  def confirmAmounts(events: DataFrame): DataFrame =
    events.where(col("event_type") === "purchase")
      .withColumn("currency", currencyOf)
      .select(col("event_id"), col("currency"),
        round(col("value").cast(dec) * currencyMultiplier, 2)
          .cast(dec).as("amt"))
      .select(col("event_id"), col("currency"),
        concat(col("amt").cast("string"), lit(" "), col("currency"))
          .as("amount_paid"))

  /** Invoice lookup by secure id (kinesis-pay.php:292-296,540-549:
    * `findBySecureId`): the reference resolves one invoice per poll
    * request; at scale the requests batch into a broadcast semi-join
    * on the hash surrogate instead of per-row point queries. The
    * requested-id set here is a deterministic subset standing in for
    * the live poll traffic.
    */
  def secureLookup(orders: DataFrame): DataFrame = {
    val withId = orders.withColumn("secure_id",
      md5(col("o_orderkey").cast("string")))
    val requested = withId.where(col("o_orderkey") % 97 === 0)
      .select(col("secure_id").as("req_id"))
    withId.join(broadcast(requested), col("secure_id") === col("req_id"),
        "left_semi")
      .select(col("secure_id"), col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(dec).cast("double").as("invoice_total"))
  }

  /** Transaction-uniqueness validation (kinesis-pay.php:515-530: a
    * Kinesis payment id must map to exactly one invoice): txn key →
    * occurrence count, keeping only violations. Single hash-agg
    * shuffle + having filter; at 100 TB the partial aggs collapse
    * almost everything map-side because violations are rare.
    */
  def txnUniqueViolations(events: DataFrame): DataFrame =
    events
      .where(col("event_type") === "purchase")
      .groupBy((col("user_id") * 1000 + col("event_id") % 1000).as("txn_key"))
      .agg(count(lit(1)).as("n_txn"),
        min(col("event_id")).as("first_event_id"))
      .where(col("n_txn") > 1)

  /** Secret masking / log redaction (kinesis-pay.php:459). */
  def maskLog(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      graft.functions.TextFunctions.maskSecret(col("props")).as("masked_props"))

  /** Request signing: nonce+method+url+body HMAC-SHA256 upper-hex
    * (kinesis-pay.php:422-424) via the native codegen expression.
    * Not SQL-oracle-able (DuckDB has no hmac) — rows-only + spec.
    */
  def hmacSign(events: DataFrame, secret: String = "test_secret"): DataFrame = {
    graft.GraftFunctions.register(events.sparkSession)
    // Secret passed as a typed literal (no SQL string interpolation —
    // quote-safe, no injection path).
    events.select(col("event_id"),
      concat(
        (col("event_id") * 1000 + 7).cast("string"), lit("GET"),
        lit("/api/merchants/payment/id/sdk/"), col("user_id").cast("string")
      ).as("message"))
      .select(col("event_id"),
        call_function("hmac_sha256_hex", col("message"), lit(secret)).as("signature"))
  }

  /** Small-cell-suppressed revenue report — the privacy-threshold
    * discipline every published aggregate table applies (suppress
    * cells backed by fewer than `k` distinct customers; a one-
    * customer nation row IS that customer's spend): per nation,
    * distinct-customer count, order count and exact-DECIMAL revenue,
    * with ALL THREE nulled and `suppressed = true` below the
    * threshold — the row inventory survives (consumers can see what
    * was withheld and why) while no small-cell statistic leaks, and
    * the counts themselves are masked too (n=1 identifies as surely
    * as the amount). One keyed aggregate + broadcast dims; the
    * suppression is a pure projection over it.
    */
  def suppressedRevenue(orders: DataFrame, customer: DataFrame,
      nation: DataFrame, k: Int = 5): DataFrame = {
    val agg = orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("o_custkey")).as("nc"),
        count(lit(1)).as("no"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("rev"))
    val ok = col("nc") >= k
    agg.select(col("n_name"), (!ok).as("suppressed"),
      when(ok, col("nc")).as("n_customers"),
      when(ok, col("no")).as("n_orders"),
      when(ok, col("rev")).as("revenue"))
  }

  /** Ingest expectations audit — the constraint checks a 100 TB load
    * runs before anything downstream trusts the tables (the
    * reference reconciles invoices one at a time,
    * kinesis-pay.php:515-549; at warehouse scale the same trust
    * question is asked of whole tables): one row per named rule with
    * its violation count, all six from keyed anti-joins / keyed
    * aggregates / scan-local predicates — no rule shuffles more than
    * its own join key, and the six scalar counts union into an
    * always-six-row frame (zero violations is a result, not an empty
    * frame — an empty audit is indistinguishable from one that did
    * not run).
    *
    * Rules: `orphan_lineitem` (lineitem → missing order),
    * `orphan_order_customer` (order → missing customer),
    * `dup_lineitem_key` (rows in excess of one per
    * (l_orderkey, l_linenumber)), `nonpositive_price`,
    * `negative_event_value`, `null_event_user`.
    */
  /** The scan-local event validity rules — ONE definition shared by
    * [[dataQuality]] (table-level counts) and
    * [[graft.streaming.StreamingOps.validityGateEventStream]]
    * (per-row ingest tags), so the batch audit and the live gate
    * cannot drift. The referential rules are deliberately NOT here:
    * a stateless stream cannot ask "does this order's customer
    * exist" without the dimension at hand — those stay batch-only.
    */
  private[graft] def eventValidityRules
      : Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "negative_event_value" -> (col("value") < 0),
    "null_event_user" -> col("user_id").isNull)

  def dataQuality(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame, events: DataFrame): DataFrame = {
    def scalar(rule: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("n_violations"))
        .select(lit(rule).as("rule"), col("n_violations"))
    val orphanLine = scalar("orphan_lineitem",
      lineitem.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti"))
    val orphanOrder = scalar("orphan_order_customer",
      orders.select(col("o_custkey"))
        .join(customer.select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti"))
    val dupKeys = lineitem.groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("n")).where(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0L)).cast("long")
        .as("n_violations"))
      .select(lit("dup_lineitem_key").as("rule"), col("n_violations"))
    val badPrice = scalar("nonpositive_price",
      lineitem.where(col("l_extendedprice") <= 0))
    val eventRules = eventValidityRules.map { case (name, cond) =>
      scalar(name, events.where(cond))
    }
    eventRules.foldLeft(
      orphanLine.unionByName(orphanOrder).unionByName(dupKeys)
        .unionByName(badPrice))(_ unionByName _)
  }
}
