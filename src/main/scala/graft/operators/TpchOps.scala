package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The rest of the classic TPC-H query forms (Q2–Q22), adapted to the
  * driver's reduced star schema (TESTDATA.md: no `partsupp`, no
  * `l_shipmode`/`l_commitdate`/`l_receiptdate`, no `c_phone`). Each
  * query keeps the PLAN SHAPE that makes its original interesting —
  * correlated aggregate subqueries, disjunctive pushdown, NOT-IN
  * anti-joins, scalar-aggregate gates, two-role dimension joins — and
  * substitutes equivalent predicates over the columns that exist. The
  * reference itself has no relational surface at all (SURVEY.md §2.3);
  * this module extends [[RelOps]]'s q1/q3/q5/q9/q18/q21 to the full
  * 22-query family.
  *
  * Determinism contract (same as RelOps): every money sum that feeds a
  * rounded output runs in FIXED POINT — `l_extendedprice`/`o_totalprice`
  * /`*_acctbal` carry exactly 2dp and `l_discount`/`l_tax` 2dp, so
  * revenue terms are exact at 4dp and a ×10⁴ `BIGINT` sum is
  * association-free (double sums can straddle a half-cent boundary
  * differently per shuffle order — the q9 failure class, RelOps.scala).
  * Threshold comparisons against scalar aggregates are pure-integer
  * (`value*1000 > total`) so no float boundary exists at all. Every
  * output ends in a total order.
  *
  * Scale design: dimension sides (`part` 2 K rows, `supplier` ~100×sf,
  * `nation`/`region` constant) are explicit `broadcast()`s — the fact
  * side never shuffles for them; fact⋈fact joins shuffle on their key
  * and AQE finalizes SMJ-vs-SHJ + skew splits at runtime. Scalar
  * aggregates ("total revenue", "avg balance") are 1-row crossJoin
  * broadcasts — the scalar-subquery shape, not a cartesian.
  */
object TpchOps {

  // exact fixed-point money arithmetic — see Money.scala for why
  // round(sum(double)) is never engine-stable
  private def revCents4 = Money.revCents4
  private def money2(sum4: org.apache.spark.sql.Column) = Money.money2(sum4)

  /** Q2-shaped min-cost supplier: for every STANDARD-type part, the
    * EUROPE supplier(s) quoting the minimum unit price (unit price =
    * min `l_extendedprice / l_quantity` over that supplier's line
    * items — the `partsupp.ps_supplycost` stand-in). The classic Q2
    * shape: an aggregate-subquery join back on the minimum. Unit
    * prices are held as ×100 BIGINT cents so the min-equality join is
    * exact. Reference has no joins at all; cf. `Master/Master.py:195`
    * (its only "query" surface is map/reduce dispatch). */
  def q2MinCostSupp(s: SparkSession, d: String): DataFrame = {
    val eurNations = broadcast(
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    val eurSupp = Tables.supplier(s, d)
      .join(eurNations, col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val stdParts = broadcast(
      Tables.part(s, d).filter(col("p_type") === "STANDARD").select("p_partkey"))
    // one offer per (part, supplier): that supplier's best unit price
    val offers = Tables.lineitem(s, d)
      .join(stdParts, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") / col("l_quantity") * 100).cast("long")
          .as("unit_cents"))
      .groupBy("p_partkey", "l_suppkey")
      .agg(min("unit_cents").as("offer_cents"))
      .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
    val minPerPart = offers
      .groupBy(col("p_partkey").as("mp_partkey"))
      .agg(min("offer_cents").as("min_cents"))
    offers
      .join(minPerPart,
        col("p_partkey") === col("mp_partkey") &&
          col("offer_cents") === col("min_cents"))
      .select(col("s_name"), col("n_name"), col("p_partkey"),
        round(col("s_acctbal"), 2).as("s_acctbal"),
        (col("offer_cents") / 100.0).as("min_price"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q4-shaped order-priority checking: orders placed in 1996Q1 with
    * at least one line item shipped >30 days after the order date (the
    * `l_commitdate < l_receiptdate` lateness stand-in), counted per
    * priority. The semi-join runs with the lateness predicate INSIDE
    * the join condition, so no late-lineitem set ever materializes. */
  def q4PriorityCheck(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    o.join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q6-shaped forecasting-revenue change: a pure scan-side query —
    * every predicate (ship year, discount band, quantity cap) pushes
    * to the parquet scan, and the answer is one fixed-point sum. The
    * 100 TB shape: zero shuffles beyond the final 1-row aggregate. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(money2(
        sum(round(col("l_extendedprice") * col("l_discount") * 10000)
          .cast("long"))).as("revenue"))

  /** Q7-shaped volume shipping: the two-role nation join — supplier
    * nation and customer nation are the SAME dimension joined twice
    * under different roles, filtered to an unordered country pair.
    * Both roles broadcast; the fact chain shuffles on orderkey and
    * custkey only. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val n1 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(money2(sum(revCents4)).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8-shaped national market share: NATION_1's share of ECONOMY-part
    * revenue sold to AMERICA customers, per order year. Numerator and
    * denominator are both exact ×10⁴ longs from ONE aggregate pass
    * (conditional sum), so the share is a single deterministic double
    * division — no second scan, no join back. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val amNations = broadcast(
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk")))
    val suppNation = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val ecoParts = broadcast(
      Tables.part(s, d).filter(col("p_type") === "ECONOMY").select("p_partkey"))
    Tables.lineitem(s, d)
      .join(ecoParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(amNations, col("c_nationkey") === col("c_nk"), "left_semi")
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1", revCents4)
          .otherwise(lit(0L))).as("nation_cents"),
        sum(revCents4).as("total_cents"))
      .select(col("o_year"),
        round(col("nation_cents") / col("total_cents").cast("double"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q10-shaped returned-item reporting: top-20 customers by revenue
    * lost to returns (`l_returnflag = 'R'`) in 1996Q1. The final top-k
    * is TakeOrderedAndProject — per-partition heaps, no global sort. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-04-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(money2(sum(revCents4)).as("revenue"))
      .select(col("c_custkey"), col("c_name"),
        col("revenue"), round(col("c_acctbal"), 2).as("c_acctbal"),
        col("n_name"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  /** Q11-shaped important parts: parts whose shipped value from
    * NATION_3 suppliers exceeds 0.1% of that nation's total — the
    * scalar-aggregate HAVING. The threshold compare is PURE INTEGER
    * (`value_cents * 1000 > total_cents`), so there is no float
    * boundary for engines to disagree on; the total is a 1-row
    * broadcast crossJoin (scalar-subquery shape). */
  def q11ImportantParts(s: SparkSession, d: String): DataFrame = {
    val n3Supp = broadcast(
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
    val perPart = Tables.lineitem(s, d)
      .join(n3Supp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("value_cents"))
    val total = perPart.agg(sum("value_cents").as("total_cents"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents"))
      .select(col("p_partkey"),
        (col("value_cents") / 100.0).as("value"))
      .orderBy(desc("value"), col("p_partkey"))
  }

  /** Q12-shaped shipping-mode priority: line items shipped in 1996,
    * bucketed FAST/SLOW by ship delay (the `l_shipmode` stand-in),
    * counting high- vs low-priority orders per bucket — the classic
    * conditional-sum pivot. One fact⋈fact shuffle on orderkey. */
  def q12ShipPriority(s: SparkSession, d: String): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .select(
        when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, "FAST")
          .otherwise("SLOW").as("ship_bucket"),
        isHigh.as("is_high"))
      .groupBy("ship_bucket")
      .agg(
        sum(when(col("is_high"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("is_high"), 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("ship_bucket")
  }

  /** Q14-shaped promotion effect: PROMO-part share of June-1996
    * revenue, as a percentage. Same one-pass conditional-sum shape as
    * [[q8MarketShare]]; `part` broadcasts. */
  def q14PromoRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-06-01") &&
        col("l_shipdate") < lit("1996-07-01"))
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revCents4).otherwise(lit(0L)))
          .as("promo_cents"),
        sum(revCents4).as("total_cents"))
      .select(round(col("promo_cents") * 100 /
        col("total_cents").cast("double"), 4).as("promo_pct"))

  /** Q13-shaped customer order distribution: LEFT OUTER join with the
    * exclusion predicate INSIDE the join condition (moving it to a
    * WHERE would silently turn the join inner — the classic Q13 trap),
    * then a two-level aggregate: orders per customer, customers per
    * order-count. Both shuffles are on bounded key domains. */
  def q13OrderDistribution(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "4-NOT SPECIFIED",
        "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count")) // count skips nulls
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** Q15-shaped top supplier: per-supplier quarterly revenue, join back
    * on the scalar max (the CREATE VIEW shape). Revenue held as exact
    * ×10⁴ longs so the max-equality join has no float boundary; the max
    * is a 1-row broadcast crossJoin. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(revCents4).as("rev4"))
    val mx = rev.agg(max("rev4").as("max4"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev4") === col("max4"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        money2(col("rev4")).as("total_rev"))
      .orderBy("s_suppkey")
  }

  /** Q16-shaped supplier counts per part profile: distinct suppliers
    * (from lineitem — the `partsupp` stand-in) per (brand, type, size)
    * for a filtered part family, EXCLUDING a NOT-IN supplier set
    * (negative account balance = the customer-complaints stand-in).
    * The exclusion is a broadcast left-anti join; the distinct expands
    * to a two-phase aggregate, never a driver-side set. */
  def q16SupplierCounts(s: SparkSession, d: String): DataFrame = {
    val parts = broadcast(
      Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size"))
    val excluded = broadcast(
      Tables.supplier(s, d).filter(col("s_acctbal") < 0).select("s_suppkey"))
    Tables.lineitem(s, d)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q17-shaped small-quantity-order revenue: line items of one brand
    * whose quantity is below 20% of that part's average — the
    * correlated-aggregate subquery, planned as an aggregate + join
    * back on partkey. `avg(l_quantity)` is exact in both engines
    * (integer-valued doubles sum exactly regardless of order), so the
    * 0.2×avg comparison is deterministic. Output is yearly-average
    * revenue: exact cents summed, ONE double division by 700. */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val brandParts = broadcast(
      Tables.part(s, d).filter(col("p_brand") === "Brand#12").select("p_partkey"))
    val li = Tables.lineitem(s, d)
      .join(brandParts, col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("p_partkey").as("ap"))
      .agg(avg("l_quantity").as("avg_qty"))
    // 4dp half-up of cents/7/100 in pure integers: round(cents/7) at
    // 1e-4-dollar grain = (2·cents+7) div 14 — /7 never terminates in
    // decimal, so a float round(…, 4) could straddle the boundary
    val n = col("cents") * 2 + 7
    li.join(avgQty, col("p_partkey") === col("ap"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .select(((n - pmod(n, lit(14L))) / lit(14L) / lit(10000.0))
        .as("avg_yearly"))
  }

  /** Q19-shaped disjunctive revenue: an OR of three (brand, size band,
    * quantity band) conjunct arms — the classic test that a disjunctive
    * join predicate still prunes: the part-side conjuncts push into the
    * broadcast build side, the lineitem quantity bounds into the scan. */
  def q19DisjunctiveRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))))
      .agg(money2(sum(revCents4)).as("revenue"))

  /** Q20-shaped part promotion: suppliers in NATION_5 who shipped more
    * than 100 units of red-named parts in 1996 — the nested semi-join
    * chain (parts-by-name → per-supplier quantity gate → supplier
    * filter). Quantity sums are integer-valued; the gate casts to long
    * so the threshold is pure-integer. */
  def q20PartPromotion(s: SparkSession, d: String): DataFrame = {
    val redParts = broadcast(
      Tables.part(s, d).filter(col("p_name").like("red%")).select("p_partkey"))
    val bigSupp = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .filter(col("qty") > 100)
      .select("l_suppkey")
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_5")),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Q22-shaped dormant high-balance customers: customers in five
    * nations (the phone-prefix stand-in) whose balance exceeds the
    * positive-balance average AND who placed no order since 2000 (the
    * original's "no orders in 7 years") — scalar-aggregate threshold +
    * anti-join against the RECENT order set (every customer here has
    * SOME order, so an all-time anti-join would gate on an empty
    * result). The above-average gate is PURE INTEGER (`cents × count >
    * total_cents`), so the average is never materialized as a float at
    * all. */
  def q22DormantCustomers(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("c_acctbal") * 100).cast("long")
    val pos = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0)
      .agg(sum(cents).as("tot_cents"), count(lit(1)).as("n_pos"))
    Tables.customer(s, d)
      .filter(col("c_nationkey").isin(10, 11, 12, 13, 14))
      .withColumn("c_cents", cents)
      .crossJoin(broadcast(pos))
      .filter(col("c_cents") * col("n_pos") > col("tot_cents"))
      .join(Tables.orders(s, d).filter(col("o_orderdate") >= lit("2000-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        (sum("c_cents") / 100.0).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_order_distribution" -> q13OrderDistribution _,
    "q15_top_supplier"       -> q15TopSupplier _,
    "q16_supplier_counts"    -> q16SupplierCounts _,
    "q17_small_qty_revenue"  -> q17SmallQtyRevenue _,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue _,
    "q20_part_promotion"     -> q20PartPromotion _,
    "q22_dormant_customers"  -> q22DormantCustomers _,
    "q2_min_cost_supp"    -> q2MinCostSupp _,
    "q4_priority_check"   -> q4PriorityCheck _,
    "q6_forecast_revenue" -> q6ForecastRevenue _,
    "q7_volume_shipping"  -> q7VolumeShipping _,
    "q8_market_share"     -> q8MarketShare _,
    "q10_returned_items"  -> q10ReturnedItems _,
    "q11_important_parts" -> q11ImportantParts _,
    "q12_ship_priority"   -> q12ShipPriority _,
    "q14_promo_revenue"   -> q14PromoRevenue _,
  )

  val oracle: Map[String, String] = Map(
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT)) AS rev4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  ((rev4 + 50) // 100) / 100.0 AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev4 = (SELECT max(rev4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part
        |    ON l_partkey = p_partkey AND p_brand = 'Brand#12'),
        |av AS (
        |  SELECT l_partkey AS ap, avg(l_quantity) AS avg_qty
        |  FROM li GROUP BY l_partkey),
        |tot AS (
        |  SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
        |  FROM li JOIN av ON l_partkey = ap
        |  WHERE l_quantity < 0.2 * avg_qty)
        |SELECT ((cents * 2 + 7) // 14) / 10000.0 AS avg_yearly
        |FROM tot""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q20_part_promotion" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN
        |    (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5')
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN
        |        (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey
        |    HAVING sum(CAST(l_quantity AS BIGINT)) > 100)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_dormant_customers" ->
      """WITH pos AS (
        |  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS tot_cents,
        |    count(*) AS n_pos
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
        |FROM customer, pos
        |WHERE c_nationkey IN (10, 11, 12, 13, 14)
        |  AND CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > tot_cents
        |  AND NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |     AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q2_min_cost_supp" ->
      """WITH eur_supp AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |offers AS (
        |  SELECT p_partkey, s_suppkey, s_name, n_name, s_acctbal,
        |    min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
        |      AS offer_cents
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        |  JOIN eur_supp ON l_suppkey = s_suppkey
        |  GROUP BY p_partkey, s_suppkey, s_name, n_name, s_acctbal),
        |min_per AS (
        |  SELECT p_partkey AS mp, min(offer_cents) AS min_cents
        |  FROM offers GROUP BY p_partkey)
        |SELECT s_name, n_name, p_partkey,
        |  round(s_acctbal, 2) AS s_acctbal,
        |  offer_cents / 100.0 AS min_price
        |FROM offers JOIN min_per
        |  ON p_partkey = mp AND offer_cents = min_cents
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q4_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT ((sum(CAST(round(l_extendedprice * l_discount * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(
        |    sum(CASE WHEN sn.n_name = 'NATION_1'
        |      THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |        AS BIGINT) ELSE 0 END)
        |    / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |        AS BIGINT)) AS DOUBLE), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE c_nationkey IN (
        |  SELECT n_nationkey FROM nation
        |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'AMERICA')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS revenue,
        |  round(c_acctbal, 2) AS c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_important_parts" ->
      """WITH per_part AS (
        |  SELECT l_partkey AS p_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_3')
        |  GROUP BY l_partkey)
        |SELECT p_partkey, value_cents / 100.0 AS value
        |FROM per_part
        |WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM per_part)
        |ORDER BY value DESC, p_partkey""".stripMargin,
    "q12_ship_priority" ->
      """SELECT
        |  CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE)) <= 30
        |    THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT round(
        |  sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT) ELSE 0 END) * 100
        |  / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |      AS BIGINT)) AS DOUBLE), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-06-01'
        |  AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin,
  )
}
