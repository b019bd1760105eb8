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

  /** SQL UDFs (Spark 4) — functions whose BODY is SQL, so they inline
    * into the plan at resolution time and stay inside whole-stage
    * codegen (no JVM-closure lane, no serialization wall): the
    * money-exact net-cents kernel as a named function, plus a second
    * UDF CALLING the first (nested resolution). The engine's answer
    * to "share business logic without paying the black-box UDF tax" —
    * at 100 TB a Scala closure UDF caps the scan at deserialization
    * speed; a SQL UDF is just more Catalyst expression tree. */
  def sqlUdf(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "lineitem")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net_cents(
        |  p DOUBLE, disc DOUBLE) RETURNS BIGINT
        |RETURN CAST(round(p * (1 - disc) * 10000) AS BIGINT)""".stripMargin)
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_taxed_cents(
        |  p DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS BIGINT
        |RETURN CAST(round(graft_net_cents(p, disc) * (1 + tax)) AS BIGINT)""".stripMargin)
    s.sql(
      """SELECT l_returnflag,
        |  count(*) AS n_items,
        |  sum(graft_net_cents(l_extendedprice, l_discount)) AS net_cents,
        |  sum(graft_taxed_cents(l_extendedprice, l_discount, l_tax))
        |    AS taxed_cents
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** SQL TABLE function (Spark 4): a parameterized relation — the
    * body resolves against the catalog at call time and plans like
    * any subquery (pushdown/pruning apply through it), the SQL-native
    * "view with arguments". */
  def sqlTvf(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "orders")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_orders_of(
        |  prio STRING)
        |RETURNS TABLE (o_orderkey BIGINT, o_custkey BIGINT, cents BIGINT)
        |RETURN SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT)
        |FROM orders WHERE o_orderpriority = prio""".stripMargin)
    s.sql(
      """SELECT count(*) AS n, sum(cents) AS sum_cents,
        |  count(DISTINCT o_custkey) AS n_cust
        |FROM graft_orders_of('1-URGENT')""".stripMargin)
  }

  /** SQL pipe syntax (Spark 4): the linear |> form of a pricing
    * summary — each stage consumes the previous relation, so the
    * query reads in execution order. Sugar only: it lowers to the
    * same Catalyst plan as the nested form (the oracle pins that). */
  def sqlPipe(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "lineitem")
    s.sql(
      """FROM lineitem
        ||> WHERE l_shipdate <= DATE '1998-09-02'
        ||> EXTEND CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |     AS BIGINT) AS rev_cents
        ||> AGGREGATE count(*) AS n_items, sum(rev_cents) AS sum_cents
        |     GROUP BY l_returnflag, l_linestatus
        ||> WHERE n_items > 100
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** String collations (Spark 4): case-insensitive comparison as a
    * TYPE property — `COLLATE UTF8_LCASE` makes equality, DISTINCT
    * and joins case-insensitive WITHOUT rewriting every column
    * through lower() (which would block stats and make every
    * comparison allocate). Tokens are restricted to ASCII letters so
    * the DuckDB lower() replay is exactly the UTF8_LCASE relation. */
  def collationOps(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "documents")
    collationBody(s)
  }

  /** The collation query over whatever `documents` view the caller
    * staged — shared with the spec's crafted mixed-case corpus.
    *
    * The token stream pre-aggregates to (token, count) FIRST (a plain
    * map-side-combinable hash aggregate), and the three collated
    * measures fold over that vocabulary-sized relation: n_cs is its
    * row count, n_ci the UTF8_LCASE-distinct count over it (distinct
    * under a coarser collation of a distinct set is unchanged), and
    * n_the the occurrence count re-weighted by the per-token counts.
    * Same results, same collation semantics exercised — but the old
    * form's two-distinct aggregate EXPANDED the full corpus token
    * stream 3× and ran every collation comparison per occurrence
    * (guide §2.3: aggregate before you shuffle); now the collation
    * work is per distinct token. */
  private[graft] def collationBody(s: SparkSession): DataFrame =
    s.sql(
      """WITH toks AS (
        |  SELECT explode(regexp_extract_all(text, '[A-Za-z]+', 0)) AS token
        |  FROM documents),
        |tc AS (SELECT token, count(*) AS c FROM toks GROUP BY token)
        |SELECT
        |  count(DISTINCT token COLLATE UTF8_LCASE) AS n_ci,
        |  count(*) AS n_cs,
        |  coalesce(sum(CASE WHEN token = 'the' COLLATE UTF8_LCASE
        |    THEN c END), 0) AS n_the
        |FROM tc""".stripMargin)

  /** SQL scripting (Spark 4): procedural control flow — DECLARE /
    * WHILE / IF — compiled and run INSIDE the engine, so each
    * statement in the script is a full Catalyst-planned query (the
    * loop below runs five pushed-down counts, not a driver-side
    * cursor). The script's value is its last statement's result.
    * Semantically the whole script folds to one aggregate — the
    * oracle pins that the procedural form loses nothing. */
  def sqlScripting(s: SparkSession, d: String): DataFrame = {
    // cloned session (the parquetAggPushdown/catalog isolation
    // pattern): the scripting conf must not leak into every later
    // query on the caller's shared session
    val cs = s.newSession()
    withView(cs, d, "orders")
    cs.conf.set("spark.sql.scripting.enabled", "true")
    cs.sql(
      """BEGIN
        |  DECLARE weighted BIGINT DEFAULT 0;
        |  DECLARE i INT DEFAULT 1;
        |  DECLARE label STRING DEFAULT '';
        |  WHILE i <= 5 DO
        |    SET weighted = weighted + i * (
        |      SELECT count(*) FROM orders
        |      WHERE substring(o_orderpriority, 1, 1) = CAST(i AS STRING));
        |    SET i = i + 1;
        |  END WHILE;
        |  IF weighted % 2 = 0 THEN
        |    SET label = 'even';
        |  ELSE
        |    SET label = 'odd';
        |  END IF;
        |  SELECT weighted, label;
        |END""".stripMargin)
  }

  /** Session variables + EXECUTE IMMEDIATE + IDENTIFIER (Spark 4):
    * the dynamic-SQL surface — a typed session variable feeds a
    * positional `?` binding, and the TABLE NAME itself arrives
    * through `IDENTIFIER(var)` (resolved safely as an identifier,
    * not string-spliced — the injection-proof form of dynamic SQL).
    * The oracle is the query with both bindings inlined. */
  def sqlVariables(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "customer")
    s.sql("DECLARE OR REPLACE VARIABLE graft_seg STRING DEFAULT 'BUILDING'")
    s.sql("SET VAR graft_seg = 'AUTOMOBILE'")
    s.sql("DECLARE OR REPLACE VARIABLE graft_tab STRING DEFAULT 'customer'")
    s.sql(
      """EXECUTE IMMEDIATE
        |  'SELECT c_mktsegment AS seg, count(*) AS n,
        |     sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS bal_cents
        |   FROM IDENTIFIER(graft_tab)
        |   WHERE c_mktsegment = ? GROUP BY c_mktsegment'
        |USING graft_seg""".stripMargin)
  }

  /** Named-parameter SQL through the API (`spark.sql(text, args)`) —
    * parameter markers bind as LITERALS at parse time (never string
    * concatenation), so a parameterized query plans identically to
    * its inlined twin: the date bounds still prune at the scan and
    * the IN list still folds. The repeated-query surface every
    * driver program needs. */
  def sqlParams(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "orders")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |FROM orders
        |WHERE o_orderdate >= :lo AND o_orderdate < :hi
        |  AND o_orderpriority IN (:p1, :p2)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("lo" -> java.sql.Date.valueOf("1995-01-01"),
          "hi" -> java.sql.Date.valueOf("1997-01-01"),
          "p1" -> "1-URGENT", "p2" -> "2-HIGH"))
  }

  /** Analyst-ergonomics sugar, all Spark 4 resolver features in one
    * query: GROUP BY ALL (group by every non-aggregate select item),
    * ORDER BY ALL (total order over the output columns left-to-right
    * — which also makes the result hash-deterministic without a
    * presentation transform), and LATERAL COLUMN ALIASES (`keysum`
    * and `cnt` referenced by sibling select items, CHAINED —
    * `per_order_x2` reads `per_order`, itself an alias — in the
    * projection above the aggregate, since resolving an LCA through
    * GROUP BY ALL itself is unsupported on both engines). Pure
    * resolution features: the PLAN is identical to the spelled-out
    * query, so there is nothing scale-relevant to price — the rung
    * exists because a user of the engine writes this shape daily.
    * DuckDB implements all three natively (same left-to-right alias
    * and ALL semantics), so the oracle is the same text modulo the
    * div spelling. */
  def sqlSugar(s: SparkSession, d: String): DataFrame = {
    withView(s, d, "orders")
    s.sql(
      """SELECT pri, st, cnt, keysum,
        |  keysum div cnt AS per_order,
        |  per_order * 2 AS per_order_x2
        |FROM (
        |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |    count(*) AS cnt, CAST(sum(o_orderkey) AS BIGINT) AS keysum
        |  FROM orders
        |  GROUP BY ALL)
        |ORDER BY ALL""".stripMargin)
  }

  /** `Dataset.transpose()` (Spark 4): rows↔columns over a BOUNDED
    * aggregate — the first column's values become the output columns,
    * each remaining input column becomes a row. Presentation-shaped
    * by nature (the transposed relation's schema depends on the DATA,
    * so it only makes sense over a small, known key domain — here the
    * 3 return flags); the aggregate below it is the usual
    * partial+final shape, and the transpose itself is a driver-side
    * pivot of an already-tiny relation. */
  def dfTranspose(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(sum("l_quantity").cast("long").as("sum_qty"),
        count(lit(1)).as("cnt"))
    agg.transpose().orderBy("key")
  }

  /** The Spark 4 DataFrame twins of LATERAL and scalar subqueries:
    * `Dataset.lateralJoin` (per-customer top-1 order — the outer()
    * marker makes the correlation explicit) and `Dataset.scalar()`
    * (a 1-row aggregate riding every output row). Plans identically
    * to the SQL forms ([[lateralTopOrders]], [[scalarSubquery]]) —
    * the rung exists because library code composes Datasets, not SQL
    * strings, and the API must reach the same Catalyst nodes
    * (DomainJoin → window/limit rewrite, ScalarSubquery). */
  def apiLateralScalar(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.lateralJoin(
        o.where(col("o_custkey") === col("c_custkey").outer())
          .orderBy(desc("o_totalprice"), col("o_orderkey")).limit(1))
      .select(col("c_custkey"), col("o_orderkey").as("top_order"),
        round(col("o_totalprice") * 100).cast("long").as("top_cents"),
        o.agg(count(lit(1)).cast("long")).scalar().as("n_orders_total"))
      .transform(Present.sortedUnbounded(_, col("c_custkey")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_sugar"     -> sqlSugar _,
    "df_transpose"  -> dfTranspose _,
    "api_lateral_scalar" -> apiLateralScalar _,
    "sql_udf"       -> sqlUdf _,
    "sql_tvf"       -> sqlTvf _,
    "sql_pipe"      -> sqlPipe _,
    "sql_scripting" -> sqlScripting _,
    "sql_variables" -> sqlVariables _,
    "sql_params"    -> sqlParams _,
    "collation_ops" -> collationOps _,
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
    "df_transpose" ->
      """WITH a AS (
        |  SELECT l_returnflag AS f, CAST(sum(l_quantity) AS BIGINT)
        |    AS sum_qty, count(*)::BIGINT AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT 'sum_qty' AS key,
        |  max(CASE WHEN f = 'A' THEN sum_qty END) AS "A",
        |  max(CASE WHEN f = 'N' THEN sum_qty END) AS "N",
        |  max(CASE WHEN f = 'R' THEN sum_qty END) AS "R"
        |FROM a
        |UNION ALL
        |SELECT 'cnt',
        |  max(CASE WHEN f = 'A' THEN cnt END),
        |  max(CASE WHEN f = 'N' THEN cnt END),
        |  max(CASE WHEN f = 'R' THEN cnt END)
        |FROM a
        |ORDER BY key""".stripMargin,
    "api_lateral_scalar" ->
      """SELECT c.c_custkey, t.o_orderkey AS top_order,
        |  CAST(round(t.o_totalprice * 100) AS BIGINT) AS top_cents,
        |  (SELECT count(*) FROM orders)::BIGINT AS n_orders_total
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |ORDER BY c.c_custkey""".stripMargin,
    "sql_sugar" ->
      """SELECT pri, st, cnt, keysum,
        |  keysum // cnt AS per_order,
        |  per_order * 2 AS per_order_x2
        |FROM (
        |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |    count(*)::BIGINT AS cnt, sum(o_orderkey)::BIGINT AS keysum
        |  FROM orders
        |  GROUP BY ALL)
        |ORDER BY ALL""".stripMargin,
    // the SQL UDFs inlined — a named function must never change the
    // answer of its own body
    "sql_udf" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT))::BIGINT AS net_cents,
        |  sum(CAST(round(CAST(round(l_extendedprice * (1 - l_discount)
        |    * 10000) AS BIGINT) * (1 + l_tax)) AS BIGINT))::BIGINT
        |    AS taxed_cents
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the table function inlined as a plain subquery
    "sql_tvf" ->
      """SELECT count(*)::BIGINT AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
        |    AS sum_cents,
        |  count(DISTINCT o_custkey)::BIGINT AS n_cust
        |FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    // the pipe form lowers to exactly this nested query
    "sql_pipe" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT))::BIGINT AS sum_cents
        |FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY 1, 2 HAVING count(*) > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the script folds to one aggregate: weighted = Σ orders of the
    // priority's leading digit (every priority starts with 1..5)
    "sql_scripting" ->
      """WITH w AS (
        |  SELECT sum(CAST(substring(o_orderpriority, 1, 1) AS BIGINT))
        |    ::BIGINT AS weighted
        |  FROM orders
        |  WHERE substring(o_orderpriority, 1, 1) BETWEEN '1' AND '5')
        |SELECT weighted,
        |  CASE WHEN weighted % 2 = 0 THEN 'even' ELSE 'odd' END AS label
        |FROM w""".stripMargin,
    // both dynamic bindings (the ? value and the IDENTIFIER table)
    // inlined
    "sql_variables" ->
      """SELECT c_mktsegment AS seg, count(*)::BIGINT AS n,
        |  sum(CAST(round(c_acctbal * 100) AS BIGINT))::BIGINT AS bal_cents
        |FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |GROUP BY c_mktsegment""".stripMargin,
    // the named parameters inlined as literals
    "sql_params" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
        |FROM orders
        |WHERE o_orderdate >= DATE '1995-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // ASCII-only tokens: UTF8_LCASE distinct/equality is exactly the
    // lower() relation
    "collation_ops" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_extract_all(text, '[A-Za-z]+')) AS token
        |  FROM documents)
        |SELECT count(DISTINCT lower(token))::BIGINT AS n_ci,
        |  count(DISTINCT token)::BIGINT AS n_cs,
        |  count(CASE WHEN lower(token) = 'the' THEN 1 END)::BIGINT
        |    AS n_the
        |FROM toks""".stripMargin,
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
