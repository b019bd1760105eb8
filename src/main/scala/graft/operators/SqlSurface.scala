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
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
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
  )

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
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
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
  )
}
