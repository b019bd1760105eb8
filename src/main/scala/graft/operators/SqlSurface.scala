package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SQL-surface operators that round out the relational inventory:
  * GROUPING SETS, PIVOT, UNPIVOT, scalar subqueries, and ordered
  * string aggregation. These run through `spark.sql` over temp views —
  * exercising the engine's SQL front door as well as the DataFrame
  * API (both lower to the same Catalyst plans).
  */
object SqlSurface {

  private def withView(s: SparkSession, d: String, t: String): Unit =
    Tables.t(s, d, t).createOrReplaceTempView(t)

  /** GROUPING SETS — finer than rollup/cube: exactly the listed
    * combinations, labeled via GROUPING(). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "orders")
    s.sql(
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
        |  count(*) AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** PIVOT: per-returnflag row, one count column per linestatus. */
  def pivotLineitem(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o"))
      .orderBy("l_returnflag")

  /** UNPIVOT (melt): customer balance metrics to long form. */
  def unpivotCustomer(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast("double").as("c_nationkey_d"))
      .unpivot(Array(col("c_custkey")),
        Array(col("c_acctbal"), col("c_nationkey_d")),
        "metric", "val")
      .orderBy("c_custkey", "metric")

  /** Scalar + correlated subqueries through the SQL front door:
    * orders above the global average with their customer's order
    * count. */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "orders")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice, 2) AS price,
        |  (SELECT count(*) FROM orders i
        |   WHERE i.o_custkey = o.o_custkey) AS cust_orders
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** EXISTS / NOT EXISTS / IN correlated subqueries — Catalyst
    * decorrelates these to semi/anti joins (RewritePredicateSubquery),
    * so the SQL front door gets the same scalable plan as the
    * DataFrame join_semi/join_anti forms. */
  def existsSubquery(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "customer"); withView(s, d, "orders")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_orderpriority = '1-URGENT') AS has_urgent,
        |  c_nationkey IN (SELECT o_custkey % 25 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey) AS quirk_in
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** NOT IN with a NULLABLE probe column — the null-aware anti join,
    * a DISTINCT physical operator from the plain LeftAnti that NOT
    * EXISTS plans to (join_anti): three-valued logic makes a NULL
    * probe never satisfy NOT IN, and Spark handles that with
    * isNullAwareAntiJoin=true on a broadcast build (asserted in
    * JoinOpsSpec). Every-10th custkey is nulled so the null path
    * actually executes; DuckDB shares the ANSI semantics verbatim. */
  def joinAntiNullAware(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "orders"); withView(s, d, "customer")
    s.sql(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END
        |  NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val Q21Nations = Seq("NATION_1", "NATION_3", "NATION_7")

  /** TPC-H Q21-shaped "waiting suppliers" — the correlated-heavy
    * planner trap: one EXISTS and one NOT EXISTS, both correlated to
    * the outer lineitem on l_orderkey with a non-equal l_suppkey
    * predicate, over lineitem self-joins. (This schema carries no
    * receipt/commit dates, so "late line" is adapted to
    * l_returnflag = 'R': the query finds the ONLY supplier with
    * returned lines on a multi-supplier finalized order.) Catalyst's
    * RewritePredicateSubquery must decorrelate both subqueries into a
    * LeftSemi and a LeftAnti on the l_orderkey equi-key — never a
    * cartesian/nested-loop — with supplier and nation broadcast;
    * PlanSpec asserts exactly that. [[q21WaitingFast]] is the
    * hand-decorrelated single-pass scale form. */
  def q21Waiting(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "supplier"); withView(s, d, "lineitem")
    withView(s, d, "orders"); withView(s, d, "nation")
    s.sql(
      s"""SELECT s_name, count(*) AS numwait
         |FROM supplier, lineitem l1, orders, nation
         |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
         |  AND EXISTS (SELECT 1 FROM lineitem l2
         |              WHERE l2.l_orderkey = l1.l_orderkey
         |                AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
         |              WHERE l3.l_orderkey = l1.l_orderkey
         |                AND l3.l_suppkey <> l1.l_suppkey
         |                AND l3.l_returnflag = 'R')
         |  AND s_nationkey = n_nationkey
         |  AND n_name IN (${Q21Nations.map("'" + _ + "'").mkString(",")})
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
  }

  /** Q21 hand-decorrelated for scale: the EXISTS/NOT EXISTS pair is
    * equivalent to two per-order facts — "has a second supplier"
    * (distinct suppliers ≥ 2) and "exactly one supplier with returned
    * lines" — both computable by window aggregates over ONE
    * l_orderkey partition of lineitem. The window's hash partitioning
    * is then REUSED by the orders join (same key, no re-shuffle), so
    * the whole query runs in 3 exchanges: lineitem window, orders
    * join side, final s_name aggregate — versus the decorrelated SQL
    * form's three separate lineitem shuffles. The presentation is
    * TakeOrdered (no exchange). PlanSpec pins the 3-exchange plan. */
  def q21WaitingFast(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_orderkey")
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("n_ret_supp", size(collect_set(
        when(col("l_returnflag") === "R", col("l_suppkey"))).over(w)))
      .filter(col("l_returnflag") === "R" &&
        col("n_supp") >= 2 && col("n_ret_supp") === 1)
    val sup = Tables.supplier(s, d)
      .join(Tables.nation(s, d).filter(col("n_name").isin(Q21Nations: _*)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    li.join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name")).limit(100)
  }

  /** Ordered string aggregation: per-nation sorted list of supplier
    * names (deterministic via sort_array). */
  def stringAgg(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .groupBy("s_nationkey")
      .agg(array_join(sort_array(collect_list(col("s_name"))), ",")
        .as("suppliers"))
      .orderBy("s_nationkey")

  /** Recursive CTE (Spark 4 WITH RECURSIVE) — hierarchy flattening,
    * the bill-of-materials / org-rollup shape: every customer walks a
    * synthetic parent chain (parent(k) = k div 2, a binary hierarchy
    * rooted at 1) and reports its depth and the sum of keys along the
    * path. Acyclic by construction, which matches the engine's
    * recursion contract: Spark 4 supports UNION ALL recursion only
    * (no fixpoint-dedup UNION yet), so cyclic reachability stays on
    * the DataFrame loop (`dedup_clusters`); each recursion step is a
    * join against the previous step's materialized result. */
  def recursiveHierarchy(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "customer")
    s.sql(
      """WITH RECURSIVE walk(start, cur, d) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT start, cur DIV 2, d + 1 FROM walk WHERE cur > 1)
        |SELECT start AS c_custkey, max(d) AS depth,
        |  sum(cur) AS path_sum
        |FROM walk GROUP BY start ORDER BY c_custkey""".stripMargin)
  }

  /** LATERAL correlated subquery with per-row LIMIT — top-2 orders
    * per urgent-segment customer, the "top-k per group without a
    * window" SQL form (Catalyst plans the lateral as a join). */
  def lateralTopOrders(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "customer"); withView(s, d, "orders")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey,
        |  round(t.o_totalprice, 2) AS price
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "recursive_hierarchy" -> recursiveHierarchy _,
    "lateral_top_orders" -> lateralTopOrders _,
    "grouping_sets"    -> groupingSets _,
    "pivot_lineitem"   -> pivotLineitem _,
    "unpivot_customer" -> unpivotCustomer _,
    "scalar_subquery"  -> scalarSubquery _,
    "string_agg"       -> stringAgg _,
    "exists_subquery"  -> existsSubquery _,
    "join_anti_null"   -> joinAntiNullAware _,
    "q21_waiting"      -> q21Waiting _,
    "q21_waiting_fast" -> q21WaitingFast _,
  )

  /** Shared DuckDB oracle for both q21 forms — the EXISTS shape is
    * the specification; the fast form must match it row for row. */
  private val q21OracleSql: String =
    s"""SELECT s_name, count(*) AS numwait
       |FROM supplier, lineitem l1, orders, nation
       |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
       |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |              WHERE l3.l_orderkey = l1.l_orderkey
       |                AND l3.l_suppkey <> l1.l_suppkey
       |                AND l3.l_returnflag = 'R')
       |  AND s_nationkey = n_nationkey
       |  AND n_name IN (${Q21Nations.map("'" + _ + "'").mkString(",")})
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  val oracle: Map[String, String] = Map(
    "recursive_hierarchy" ->
      """WITH RECURSIVE walk(start, cur, d) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT start, cur // 2, d + 1 FROM walk WHERE cur > 1)
        |SELECT start AS c_custkey, max(d) AS depth,
        |  sum(cur)::BIGINT AS path_sum
        |FROM walk GROUP BY start ORDER BY c_custkey""".stripMargin,
    "lateral_top_orders" ->
      """SELECT c.c_custkey, t.o_orderkey,
        |  round(t.o_totalprice, 2) AS price
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |WHERE c.c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey, price DESC, o_orderkey""".stripMargin,
    "grouping_sets" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN '(all)' ELSE o_orderstatus END AS status,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN '(all)' ELSE o_orderpriority END AS priority,
        |  count(*) AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "pivot_lineitem" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "unpivot_customer" ->
      """SELECT c_custkey, metric, val FROM (
        |  SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS val FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'c_nationkey_d', c_nationkey::DOUBLE FROM customer)
        |ORDER BY c_custkey, metric""".stripMargin,
    "scalar_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice, 2) AS price,
        |  (SELECT count(*) FROM orders i
        |   WHERE i.o_custkey = o.o_custkey) AS cust_orders
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "string_agg" ->
      """SELECT s_nationkey,
        |  string_agg(s_name, ',' ORDER BY s_name) AS suppliers
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "join_anti_null" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END
        |  NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY o_orderkey""".stripMargin,
    "exists_subquery" ->
      """SELECT c_custkey, c_mktsegment,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_orderpriority = '1-URGENT') AS has_urgent,
        |  c_nationkey IN (SELECT o_custkey % 25 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey) AS quirk_in
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,
    "q21_waiting"      -> q21OracleSql,
    "q21_waiting_fast" -> q21OracleSql,
  )
}
