package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational coverage over the star-schema testdata (SURVEY.md §2.3 —
  * the north-star extension of the reference's MapReduce surface to a
  * full relational engine; the reference itself has no joins, windows,
  * sorts, or set ops).
  *
  * Scale design notes (local[32] here, 1000-executor / 100 TB target):
  *   - Dimension tables (`region`, `nation`) get an explicit
  *     `broadcast()` hint: they are bounded (25/5 rows at any SF), so
  *     the fact-side join never shuffles.
  *   - Fact⋈fact joins (orders⋈lineitem, customer⋈orders) are left to
  *     Catalyst/AQE: both sides shuffle on the join key, and AQE picks
  *     SMJ/SHJ + handles skew at runtime.
  *   - Every aggregate is declarative `groupBy().agg()` so Catalyst
  *     plans partial (map-side) + final hash aggregation; nothing here
  *     ships raw rows to a single node.
  *   - Money/average outputs never round a double: sums run in exact
  *     ×10ᵏ BIGINT fixed point with integer half-up rounding, mirrored
  *     in the oracle (see Money.scala for the two observed failure
  *     classes — association order and shortest-repr rounding).
  *   - Every query ends in a total order (unique sort key) so the
  *     driver's row-by-row hash compare is deterministic.
  */
object RelOps {

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** TPC-H Q1-flavored pricing summary: scan → filter (pushed to
    * parquet) → partial/final hash agg → tiny sort. All money/average
    * outputs are exact fixed-point (Money.scala): base price in
    * cents, disc price ×10⁴, charge ×10⁶ (2dp·2dp·2dp term) rounded
    * via BIGINT `div` (its sums pass 2^53 at sf0.1), averages as
    * pure-integer half-up — no double is ever rounded, so no engine
    * can disagree at a boundary. Quantities are integer-valued, so
    * their plain sum is already exact. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(Money.cents(col("l_extendedprice"))).as("base_c"),
        sum(Money.revCents4).as("disc4"),
        sum(round(revenue * (lit(1) + col("l_tax")) * 1000000).cast("long"))
          .as("charge6"),
        sum(Money.cents(col("l_discount"))).as("disc_c"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        (col("qty") * 1.0).as("sum_qty"),
        (col("base_c") / 100.0).as("sum_base_price"),
        Money.money2(col("disc4")).as("sum_disc_price"),
        Money.divFp("charge6", 4, 2).as("sum_charge"),
        Money.avgFp4("qty", "count_order", 10000L).as("avg_qty"),
        Money.avgFp4("disc_c", "count_order", 100L).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-flavored: 3-way fact join, group, top-10 by revenue.
    * customer⋈orders shuffles on custkey, ⋈lineitem on orderkey; the
    * final top-k is TakeOrderedAndProject (no global sort shuffle). */
  def q3TopOrders(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(Money.money2(sum(Money.revCents4)).as("rev"))
      .orderBy(desc("rev"), col("o_orderkey"))
      .limit(10)

  /** TPC-H Q5-flavored: broadcast dims (region→nation), shuffle facts;
    * revenue per nation for one region. */
  def q5NationRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = broadcast(
      Tables.nation(s, d).join(
        broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey")))
    Tables.customer(s, d)
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d),
        col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(Money.money2(sum(Money.revCents4)).as("rev"))
      .transform(Present.sorted(_, desc("rev"), col("n_name")))
  }

  /** TPC-H Q9-shaped product-type profit: lineitem ⋈ part (filtered,
    * broadcast) ⋈ supplier ⋈ nation (broadcast), profit by nation ×
    * order-year. Exercises a 4-way join with two broadcast dims and a
    * fact⋈fact shuffle on orderkey. */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val promoParts = broadcast(
      Tables.part(s, d).filter(col("p_type").isin("PROMO", "ECONOMY"))
        .select("p_partkey"))
    val supNation = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    // Per-row profit has exactly 4 decimal places (2dp price × 2dp
    // discount), so summing it as a ×10⁴ fixed-point long is EXACT and
    // order-independent — a double sum rounded to 2dp can straddle a
    // half-cent boundary differently per engine/shuffle order (seen at
    // sf0.001: 1372920.005 → .00 vs .01). Same arithmetic in the
    // oracle.
    Tables.lineitem(s, d)
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(Money.money2(sum(Money.revCents4)).as("profit"))
      .transform(Present.sorted(_, col("nation"), desc("o_year")))
  }

  /** TPC-H Q18-shaped large-volume orders: aggregate lineitem per
    * order, HAVING-filter to the big ones (the filter runs on the
    * aggregate BEFORE the joins, so only qualifying keys join), then
    * enrich with customer/order dims. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .filter(col("total_qty") > 300) // HAVING
    big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("total_qty"))
      .transform(Present.sortedUnbounded(_, desc("total_qty"), col("o_orderkey")))
  }

  /** Left-semi join: customers that have at least one order. Streams
    * the fact side; the semi join needs only the key column of orders
    * (column pruning pushes that into the scan). */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
        "left_semi")
      .select("c_custkey", "c_name")
      .transform(Present.sortedUnbounded(_, col("c_custkey")))

  /** Left-anti join: customers with no orders. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
      .transform(Present.sortedUnbounded(_, col("c_custkey")))

  /** Aggregate variety: count, exact distinct (expands to a two-phase
    * aggregate on (priority, custkey) — scales; no driver-side set),
    * sum/avg/min/max. */
  def aggStats(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct("o_custkey").as("n_customers"),
        sum(Money.cents(col("o_totalprice"))).as("price_c"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"))
      .select(col("o_orderpriority"), col("n_orders"), col("n_customers"),
        (col("price_c") / 100.0).as("sum_price"),
        Money.avgFp4("price_c", "n_orders", 100L).as("avg_price"),
        col("min_price"), col("max_price"))
      .orderBy("o_orderpriority")

  /** ROLLUP over (status, priority). Super-aggregate rows are labeled
    * via grouping() instead of NULL so Spark/DuckDB null-ordering
    * differences can't affect the sort. */
  def rollupOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(
        // grouping() is only legal inside the rollup's agg list
        when(grouping(col("o_orderstatus")) === 1, lit("(all)"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(grouping(col("o_orderpriority")) === 1, lit("(all)"))
          .otherwise(col("o_orderpriority")).as("priority"),
        count(lit(1)).as("n"),
        (sum(Money.cents(col("o_totalprice"))) / 100.0).as("sum_price"))
      .select("status", "priority", "n", "sum_price")
      .orderBy("status", "priority")

  /** CUBE over (returnflag, linestatus) on lineitem. */
  def cubeLineitem(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        when(grouping(col("l_returnflag")) === 1, lit("(all)"))
          .otherwise(col("l_returnflag")).as("flag"),
        when(grouping(col("l_linestatus")) === 1, lit("(all)"))
          .otherwise(col("l_linestatus")).as("status"),
        count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select("flag", "status", "n", "sum_qty")
      .orderBy("flag", "status")

  /** Window functions: per-customer recency rank, lag, running sum.
    * Partition key = custkey (the shuffle), order unique via orderkey
    * tie-break; frame is explicit ROWS so RANGE-vs-ROWS defaults can't
    * differ between engines. Keeps the 3 most recent orders/customer.
    * The running sum is ×100 fixed-point (see [[windowFrames]]). */
  def windowOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_orderdate"), col("o_orderkey"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cents = round(col("o_totalprice") * 100).cast("long")
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
        round(sum(cents).over(run) / 100.0, 2).as("run_sum"))
      .filter(col("rn") <= 3)
      .transform(Present.sortedUnbounded(_, col("o_custkey"), col("rn")))
  }

  /** The rest of the window-function surface: sliding ROWS frames,
    * distribution ranks (ntile / percent_rank / cume_dist), and
    * first/last_value with an explicit full frame (last_value under
    * the default frame is the CURRENT row — a classic cross-engine
    * trap, avoided by spelling the frame out). All orderings carry an
    * o_orderkey tie-break so every rank is total. The windowed sums
    * run over ×100 fixed-point cents (o_totalprice has 2dp, so the
    * long sum is EXACT and association-free) — DuckDB evaluates
    * windowed aggregates via segment trees, not a left-to-right fold,
    * so a double running sum could associate differently and straddle
    * a rounding boundary (the q9 failure class). One shuffle on
    * custkey serves all seven windows (two sort orders within the
    * same partitioning). */
  def windowFrames(s: SparkSession, d: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val sliding = byDate.rowsBetween(-2, Window.currentRow)
    val running = byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full    = byDate.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cents = round(col("o_totalprice") * 100).cast("long")
    Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_custkey"),
        round(sum(cents).over(running) / 100.0, 2).as("run_total"),
        round(sum(cents).over(sliding) /
          (count(lit(1)).over(sliding) * 100.0), 4).as("avg3"),
        ntile(4).over(byPrice).as("price_quartile"),
        round(percent_rank().over(byPrice), 6).as("pr"),
        round(cume_dist().over(byPrice), 6).as("cd"),
        first_value(col("o_orderkey")).over(byDate).as("first_ok"),
        last_value(col("o_orderkey")).over(full).as("last_ok"))
      // narrow barrier before the presentation sort: the range
      // partitioner samples its child, and with the two-sort window
      // chain as the sort's direct child the whole chain ran twice
      // (sample + shuffle pass) — 1.06 → 0.89 s at sf0.1. The same
      // barrier REGRESSES cheap single-window shapes (window_range
      // 0.60 → 0.75 s measured), so it is not applied there.
      .repartition(s.sparkContext.defaultParallelism, col("o_orderkey"))
      .transform(Present.sortedUnbounded(_, col("o_orderkey")))
  }

  /** Time-RANGE window frame — the frame type [[windowFrames]] does
    * NOT cover: a trailing 30-DAY interval over event time, where the
    * frame holds every PEER row inside the time band (not a fixed row
    * count). The canonical "trailing-month customer spend" analytic.
    * RANGE frames are tie-insensitive by definition (all peers of the
    * current timestamp are in-frame), so the output is deterministic
    * without an intra-frame tie-break; the row itself still carries
    * the orderkey for a total presentation order. Sums run in exact
    * cents. One shuffle on custkey. */
  def windowRangeInterval(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = "PARTITION BY o_custkey ORDER BY o_orderdate " +
      "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW"
    Tables.orders(s, d)
      .withColumn("cents", Money.cents(col("o_totalprice")))
      .selectExpr("o_orderkey", "o_custkey",
        s"sum(cents) OVER ($w) / CAST(100 AS DOUBLE) AS spend_30d",
        s"count(*) OVER ($w) AS n_30d")
      .transform(Present.sortedUnbounded(_, col("o_orderkey")))
  }

  /** Top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    * per-partition heaps + a k-row driver merge, no global sort. */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(10)

  /** Set operations on the nation-key sets of customers vs suppliers,
    * tagged and unioned into one deterministic relation. */
  def setOpsNations(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nk")).distinct()
    val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nk")).distinct()
    c.intersect(sup).withColumn("op", lit("intersect"))
      .unionByName(c.except(sup).withColumn("op", lit("except")))
      .unionByName(c.union(sup).distinct().withColumn("op", lit("union")))
      .select("op", "nk")
      .transform(Present.sorted(_, col("op"), col("nk")))
  }

  /** Scalar string/math function coverage on part. */
  def scalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        substring(col("p_type"), 1, 5).as("type5"),
        length(col("p_name")).as("name_len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        ceil(col("p_retailprice")).as("price_ceil"),
        floor(col("p_retailprice")).as("price_floor"),
        round(col("p_retailprice"), 1).as("price_round"),
        pmod(col("p_size"), lit(7)).as("size_mod7"),
        (col("p_size") * 2 + 1).as("size_x2p1"))
      .orderBy("p_partkey")

  /** Date/time function coverage on orders. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("day"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy("o_orderkey")

  /** Events: JSON prop extraction + 10-minute tumbling-window agg —
    * the batch form of the streaming pipeline (StreamOps runs the same
    * aggregation with readStream + watermark). */
  def eventsWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum("value"), 3).as("sum_value"),
        sum("k").as("sum_k"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"), col("sum_k"))
      .transform(Present.sortedUnbounded(_, col("window_start"), col("event_type")))

  /** Approximate distinct (HyperLogLog++) — the 100 TB cardinality
    * path. The sketch value itself is engine-specific, so the gate is
    * a BRACKET: emit the exact cardinality (the oracle recomputes it)
    * plus a boolean asserting the sketch landed within its error
    * envelope (3× the default 5% rsd, floored for tiny groups). The
    * DuckDB oracle emits literal TRUE — the hash gate therefore fails
    * iff the sketch leaves its bound. The exact count_distinct
    * companion is gate harness only; at 100 TB the sketch column IS
    * the product (bounded memory, mergeable across executors). */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count_distinct(col("user_id")).as("exact_users"),
        approx_count_distinct("user_id").as("hll"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("hll") - col("exact_users")) <=
          greatest(col("exact_users") * lit(0.15), lit(16.0))).as("approx_ok"))
      .orderBy("event_type")

  /** Mergeable-sketch distinct counting (Apache DataSketches HLL via
    * Spark 4's hll_* functions): build one sketch PER DAY, then merge
    * the partial sketches per event type and estimate — the two-level
    * shape a warehouse lands per-partition sketches in, so "distinct
    * users over any date range" is a sketch-union over the range, not
    * a rescan (state per (type, day) is a ~KB sketch; the raw column
    * is read exactly once, ever). Same bracket gate as
    * [[approxDistinct]]: the sketch value is engine-specific, so the
    * output is the EXACT cardinality (the oracle recomputes it) plus
    * a boolean pinning the merged estimate inside 3× the sketch's
    * nominal error; DuckDB emits literal TRUE. */
  def hllDailyMerge(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val merged = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact_users"))
      .join(merged, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <=
          greatest(col("exact_users") * lit(0.15), lit(16.0))).as("merge_ok"))
      .orderBy("event_type")
  }

  /** Process-scoped cached intermediate for [[cachedReuse]] — one
    * InMemoryRelation per (session, dir), built once like the other
    * landed artifacts (warehouse, lmStore), so repeated registration
    * or bench passes don't stack duplicate cache entries. The cached
    * table is the per-supplier aggregate: |suppliers| rows, bounded. */
  private val cachedAggs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def supplierQtyCached(s: SparkSession, d: String): DataFrame = {
    // keyed by the session OBJECT (reference equality — unlike
    // identity hash codes, which can be reused after a session is
    // GC'd and hand a new session a DataFrame bound to a stopped
    // one); entries of stopped sessions are swept so the map pins
    // neither the persisted RDD nor the SparkSession forever
    cachedAggs.entrySet.removeIf(e =>
      e.getKey._1.sparkContext.isStopped)
    cachedAggs.computeIfAbsent((s, d), _ =>
      Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** Cache-reuse rung: one cached aggregate consumed by TWO plan
    * legs — the 1-row global threshold (suppliers whose total shipped
    * quantity exceeds the corpus mean) and the row stream it filters.
    * Without the cache the lineitem scan + shuffle would run twice;
    * with it both legs read the same InMemoryRelation (PlanSpec pins
    * two InMemoryTableScan nodes and a single materialization). The
    * mean compare is kept in exact integer arithmetic
    * (sum_qty * n > total) so the gate is ulp-proof. At 100 TB this
    * is the "land the aggregate once, derive many" pattern; the
    * cached table is |suppliers| rows, not the fact table. */
  def cachedReuse(s: SparkSession, d: String): DataFrame = {
    val agg = supplierQtyCached(s, d)
    val thr = agg.agg(sum("sum_qty").as("tot"), count("*").as("n"))
    agg.crossJoin(broadcast(thr))
      .filter(col("sum_qty") * col("n") > col("tot"))
      .select("l_suppkey", "sum_qty")
      .transform(Present.sortedUnbounded(_, col("l_suppkey")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cached_reuse"       -> cachedReuse _,
    "hll_daily_merge"    -> hllDailyMerge _,
    "q1_pricing_summary" -> q1PricingSummary _,
    "q3_top_orders"      -> q3TopOrders _,
    "q5_nation_revenue"  -> q5NationRevenue _,
    "q9_product_profit"  -> q9ProductProfit _,
    "q18_large_orders"   -> q18LargeOrders _,
    "join_semi"          -> joinSemi _,
    "join_anti"          -> joinAnti _,
    "agg_stats"          -> aggStats _,
    "rollup_orders"      -> rollupOrders _,
    "cube_lineitem"      -> cubeLineitem _,
    "window_orders"      -> windowOrders _,
    "window_frames"      -> windowFrames _,
    "window_range_interval" -> windowRangeInterval _,
    "topk_orders"        -> topkOrders _,
    "setops_nations"     -> setOpsNations _,
    "scalar_funcs"       -> scalarFuncs _,
    "date_funcs"         -> dateFuncs _,
    "events_window"      -> eventsWindow _,
    "approx_distinct"    -> approxDistinct _,
  )

  val oracle: Map[String, String] = Map(
    "cached_reuse" ->
      """SELECT l_suppkey, sum_qty FROM (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY 1) t
        |WHERE sum_qty * (SELECT count(DISTINCT l_suppkey) FROM lineitem)
        |      > (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem)
        |ORDER BY l_suppkey""".stripMargin,
    "hll_daily_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS merge_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
        |    AS sum_base_price,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS sum_disc_price,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |    * 1000000) AS BIGINT)) + 5000) // 10000) / 100.0 AS sum_charge,
        |  ((2 * sum(CAST(l_quantity AS BIGINT)) * 10000 + count(*))
        |    // (2 * count(*))) / 10000.0 AS avg_qty,
        |  ((2 * sum(CAST(round(l_discount * 100) AS BIGINT)) * 100 + count(*))
        |    // (2 * count(*))) / 10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS rev
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY rev DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS rev
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY rev DESC, n_name""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation,
        |  year(o_orderdate) AS o_year,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type IN ('PROMO', 'ECONOMY')
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 2) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "agg_stats" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price,
        |  ((2 * sum(CAST(round(o_totalprice * 100) AS BIGINT)) * 100 + count(*))
        |    // (2 * count(*))) / 10000.0 AS avg_price,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "rollup_orders" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
        |  count(*) AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "cube_lineitem" ->
      """SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN '(all)' ELSE l_returnflag END AS flag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN '(all)' ELSE l_linestatus END AS status,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "window_orders" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |    round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      / 100.0, 2) AS run_sum
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_frames" ->
      """SELECT o_orderkey, o_custkey,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    OVER (d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / 100.0, 2) AS run_total,
        |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    OVER (d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |    / (count(*) OVER (d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |       * 100.0), 4) AS avg3,
        |  ntile(4) OVER p AS price_quartile,
        |  round(percent_rank() OVER p, 6) AS pr,
        |  round(cume_dist() OVER p, 6) AS cd,
        |  first_value(o_orderkey) OVER d AS first_ok,
        |  last_value(o_orderkey) OVER (d ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING) AS last_ok
        |FROM orders
        |WINDOW d AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       p AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "window_range_interval" ->
      """SELECT o_orderkey, o_custkey,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w / 100.0
        |    AS spend_30d,
        |  count(*) OVER w AS n_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "setops_nations" ->
      """WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |     s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT 'intersect' AS op, nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
        |UNION ALL
        |SELECT 'except' AS op, nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
        |UNION ALL
        |SELECT 'union' AS op, nk FROM (SELECT nk FROM c UNION SELECT nk FROM s)
        |ORDER BY op, nk""".stripMargin,
    "scalar_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS lname,
        |  upper(p_brand) AS ubrand,
        |  substring(p_type, 1, 5) AS type5,
        |  length(p_name) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  round(p_retailprice, 1) AS price_round,
        |  p_size % 7 AS size_mod7,
        |  p_size * 2 + 1 AS size_x2p1
        |FROM part ORDER BY p_partkey""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS day,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "events_window" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
        |  event_type, count(*) AS n,
        |  round(sum(value), 3) AS sum_value,
        |  CAST(sum(json_extract_string(props, '$.k')::INT) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
  )
}
