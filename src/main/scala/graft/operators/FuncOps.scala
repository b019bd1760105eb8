package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining scalar/aggregate function-family coverage: exact
  * percentiles, null-handling functions, array functions (build,
  * sort, transform, fold), and the ALL variants of set operations.
  */
object FuncOps {

  /** Exact percentiles per group. Spark's percentile() is an exact
    * (sort-based) aggregate; the approx path for 100 TB is
    * percentile_approx (t-digest), registered rows-only below. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"))
      .orderBy("l_returnflag")

  /** percentile_approx — the sketch the 100 TB path uses (bounded
    * memory, mergeable). The sketch value is engine-specific, so the
    * gate is a BRACKET: emit the exact p50 (the oracle recomputes it
    * via quantile_cont) plus a boolean asserting the approx landed
    * between the exact 0.49 and 0.51 quantiles — accuracy 10000
    * guarantees rank error ≤ n/10000, far inside that ±0.01-rank
    * window. Oracle emits literal TRUE, so the hash gate fails iff
    * the sketch leaves the window. Exact percentile companions are
    * gate harness only; at 100 TB the sketch IS the product. */
  def percentilesApprox(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50e"),
        percentile(col("l_quantity"), lit(0.49)).as("plo"),
        percentile(col("l_quantity"), lit(0.51)).as("phi"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50a"))
      .select(col("l_returnflag"),
        round(col("p50e"), 4).as("p50_exact"),
        (col("p50a") >= col("plo") && col("p50a") <= col("phi")).as("approx_ok"))
      .orderBy("l_returnflag")

  /** The try_* error-handling family — topical under Spark 4's
    * default ANSI mode, where plain arithmetic THROWS on division by
    * zero, numeric overflow, and malformed casts. try_divide /
    * try_add / try_cast degrade the poisoned ROW to NULL instead of
    * killing the job — the behavior a 100 TB pipeline wants when one
    * bad record must not fail a day of compute. Each column mixes
    * success and failure rows deterministically; the oracle spells
    * the same three-valued results with CASE / TRY_CAST. */
  def tryFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        // custkey ≡ 0 (mod 7) → divide by zero → NULL
        round(try_divide(col("c_acctbal"), col("c_custkey") % 7), 4).as("div7"),
        // even keys carry a numeric string (survives), odd keys a
        // non-numeric name (malformed → NULL); the value round-trips
        // through VARCHAR so engine float-formatting can't leak in
        when(col("c_custkey") % 2 === 0, col("c_acctbal").cast("string"))
          .otherwise(col("c_name")).try_cast("double").as("cast_back"),
        // custkey > 1000 overflows long → NULL, ≤ 1000 survives
        try_add(lit(Long.MaxValue - 1000), col("c_custkey")).as("near_max"))
      .orderBy("c_custkey")

  /** Null-handling functions. The testdata has no NULLs, so nulls are
    * MANUFACTURED via nullif — which is itself part of the surface. */
  def nullFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(redacted)"))
          .as("seg_coalesced"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal"))
          .as("bal_pos"),
        isnull(nullif(col("c_mktsegment"), lit("BUILDING"))).as("is_building"))
      .orderBy("c_custkey")

  /** Array functions over a per-order collected array: deterministic
    * build (sort_array over collect_list), index, slice, fold
    * (aggregate), and element-wise transform. Per-order groups are
    * bounded (≤7 lineitems) so collect_list is safe here; unbounded
    * groups would use the agg forms instead. */
  def arrayOps(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_quantity"))).as("qs"))
      // sort BEFORE the lambda projection: the sort key is already on
      // the aggregate output, so ordering first means the range
      // sampler reads the aggregate's shuffle files and the
      // interpreted array lambdas run ONCE, above the sort, instead
      // of twice below it (sample + shuffle pass) — 1.25 → 0.84 s at
      // sf0.1. Order is preserved through the projection.
      .orderBy("l_orderkey")
      .select(
        col("l_orderkey"),
        size(col("qs")).as("n"),
        element_at(col("qs"), 1).as("q_min"),
        element_at(col("qs"), -1).as("q_max"),
        round(aggregate(col("qs"), lit(0.0), (acc, x) => acc + x), 2)
          .as("q_sum"),
        round(aggregate(transform(col("qs"), x => x * 2.0), lit(0.0),
          (acc, x) => acc + x), 2).as("q2_sum"),
        exists(col("qs"), _ > 49.0).as("has_big"))

  /** INTERSECT ALL / EXCEPT ALL — multiset semantics (the reference's
    * merge is a multiset concat, so the ALL variants matter). */
  def setOpsAll(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
    val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
    c.intersectAll(sup).groupBy("nk").agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
      .unionByName(
        c.exceptAll(sup).groupBy("nk").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all")))
      .select("op", "nk", "n")
      .orderBy("op", "nk")
  }

  /** Data profiling — the per-column stats pass every ingest pipeline
    * runs before training: one aggregate-only scan (no shuffle beyond
    * the single final row), unpivoted to (column, metric rows).
    * Distinct counts use exact count_distinct here (oracle-checkable);
    * the 100 TB path swaps in approx_count_distinct per column. */
  def profileLineitem(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    // averages in pure-integer fixed point (Money.scala); stddev stays
    // a rounded double — no fixed-point form exists and both engines'
    // two-pass/Welford results have agreed at every gate so far.
    // The two count_distincts run as THEIR OWN single-distinct
    // aggregates (1-row cross join back): two distinct groups inside
    // the main aggregate made Catalyst EXPAND the scan 3× through the
    // hash aggregate (guide §2.3 — shuffle/aggregate fewer bytes);
    // split, each distinct partial-aggregates its own pruned column
    // and the plain metrics stay one narrow pass.
    val one = li.agg(
      count(lit(1)).as("n_rows"),
      sum(col("l_quantity").isNull.cast("long")).as("quantity_nulls"),
      round(min("l_quantity"), 2).as("quantity_min"),
      round(max("l_quantity"), 2).as("quantity_max"),
      sum(col("l_quantity").cast("long")).as("qty_sum"),
      round(stddev_samp("l_quantity"), 4).as("quantity_std"),
      round(min("l_extendedprice"), 2).as("price_min"),
      round(max("l_extendedprice"), 2).as("price_max"),
      sum(Money.cents(col("l_extendedprice"))).as("price_c"))
      .crossJoin(li.agg(
        count_distinct(col("l_orderkey")).as("orderkey_distinct")))
      .crossJoin(li.agg(
        count_distinct(col("l_returnflag")).as("returnflag_distinct")))
      .select(
        col("n_rows"), col("orderkey_distinct"), col("quantity_nulls"),
        col("quantity_min"), col("quantity_max"),
        Money.avgFp4("qty_sum", "n_rows", 10000L).as("quantity_avg"),
        col("quantity_std"), col("price_min"), col("price_max"),
        Money.avgFp4("price_c", "n_rows", 100L).as("price_avg"),
        col("returnflag_distinct"))
    one.unpivot(Array.empty, one.columns.map(col),
        "metric", "value")
      .orderBy("metric")
  }

  /** Cross-table data-quality report — the constraint-validation pass
    * an ingest pipeline runs before promoting a snapshot: key nulls,
    * key uniqueness, referential integrity in BOTH directions
    * (orphaned children AND childless parents), and a domain range
    * check, each emitted as one (check, violations, checked) row.
    * Null/unique/range checks are single-pass aggregates; the
    * referential checks are anti-join counts on the key — at 100 TB
    * each is one key-column shuffle (or zero with the [[graft.sources.StorageOps]]
    * warehouse layout), never a row-by-row lookup. The childless-
    * parent counts are deliberately non-zero on clean data, so the
    * hash gate checks real values rather than a row of zeros. */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    def check(name: String, violations: DataFrame, checked: DataFrame) =
      violations.agg(count(lit(1)).as("violations"))
        .crossJoin(checked.agg(count(lit(1)).as("checked")))
        .select(lit(name).as("check_name"), col("violations"), col("checked"))
    val keyNulls = check("orders_custkey_null",
      ord.filter(col("o_custkey").isNull), ord)
    val keyUnique = check("customer_key_duplicates",
      cust.groupBy("c_custkey").count().filter(col("count") > 1), cust)
    val orphanOrders = check("orders_orphaned_custkey",
      ord.join(cust, col("o_custkey") === col("c_custkey"), "left_anti"), ord)
    val orphanItems = check("lineitem_orphaned_orderkey",
      li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti"), li)
    val childless = check("customers_without_orders",
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti"), cust)
    val range = check("discount_out_of_range",
      li.filter(col("l_discount") < 0 || col("l_discount") > 1), li)
    keyNulls.unionByName(keyUnique).unionByName(orphanOrders)
      .unionByName(orphanItems).unionByName(childless).unionByName(range)
      .transform(Present.sorted(_, col("check_name")))
  }

  /** Schema-full JSON parsing (SURVEY.md §1.4: `from_json` — vs the
    * path-extraction `get_json_object` used by events_window): props
    * parsed to a typed MAP, entries exploded, stats per (type, key).
    * At scale this is one narrow codegen'd pass + one bounded agg. */
  def jsonMapFuncs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
    Tables.events(s, d)
      .withColumn("m",
        from_json(col("props"), MapType(StringType, IntegerType)))
      .select(col("event_type"), explode(col("m")).as(Seq("key", "val")))
      .groupBy("event_type", "key")
      .agg(count(lit(1)).as("n"),
        min("val").as("k_min"), max("val").as("k_max"),
        sum(col("val").cast("long")).as("k_sum"))
      .select(col("event_type"), col("key"), col("n"),
        col("k_min"), col("k_max"),
        Money.avgFp4("k_sum", "n", 10000L).as("k_avg"))
      .orderBy("event_type", "key")
  }

  /** Corrupt-record-tolerant JSON ingest — the row-level counterpart
    * of the scalar try_* family: a deterministic seventh of the
    * events' props payloads is mangled, the PERMISSIVE `from_json`
    * degrades exactly those rows to NULL instead of failing the job,
    * and the report counts survivors/corrupt and aggregates only the
    * parsed side. At 100 TB one malformed record must never kill a
    * day of ingest; the dead-letter count IS the monitoring signal.
    * The oracle reproduces the mangling and uses json_validity on
    * its side, so both engines must agree row-for-row on what is
    * salvageable. */
  def jsonDirtyParse(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
    Tables.events(s, d)
      .withColumn("raw",
        when(col("event_id") % 7 === 0, concat(lit("corrupt::"), col("props")))
          .otherwise(col("props")))
      .withColumn("m", from_json(col("raw"), MapType(StringType, IntegerType)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("m").isNull.cast("long")).as("n_corrupt"),
        sum(when(col("m").isNotNull, size(col("m"))).otherwise(0))
          .cast("long").as("parsed_keys"),
        sum(when(col("m").isNotNull, element_at(col("m"), "k")))
          .cast("long").as("sum_k"))
      .transform(Present.sorted(_, col("event_type")))
  }

  /** Spark 4 VariantType — the modern semi-structured lane (the
    * binary variant encoding of the open Parquet/Iceberg VARIANT
    * spec): `parse_json` builds a variant once per row, typed
    * `variant_get` path extraction replaces string re-parsing per
    * field, and `try_variant_get` yields NULL on a missing path
    * instead of failing the row. The query nests the events props
    * under a constructed envelope so the extraction exercises real
    * multi-level paths; the oracle replays the same paths with
    * DuckDB's JSON extraction. At scale variant beats
    * get_json_object because the parse happens ONCE per row into a
    * binary form all downstream extractions share, instead of one
    * string parse per extraction. */
  def variantOps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(
        concat(lit("{\"meta\":{\"type\":\""), col("event_type"),
          lit("\"},\"payload\":"), col("props"), lit("}"))))
      .select(col("event_type"),
        expr("variant_get(v, '$.payload.k', 'int')").as("k"),
        expr("variant_get(v, '$.meta.type', 'string')").as("vtype"),
        expr("try_variant_get(v, '$.meta.absent', 'int')").as("missing"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"), min("k").as("min_k"), max("k").as("max_k"),
        count(col("missing")).as("n_missing"),
        sum(when(col("vtype") === col("event_type"), 1L).otherwise(0L))
          .as("n_type_ok"))
      .transform(Present.sorted(_, col("event_type")))

  /** In-flight observed metrics (`Dataset.observe` → `CollectMetrics`):
    * the data-quality counters ride the SAME pass as the real job —
    * here a filtered count — instead of a second full scan, which is
    * the only affordable monitoring shape at 100 TB (profile the feed
    * WHILE consuming it). The observation's aggregates evaluate
    * per-partition and fold on the driver through the listener bus;
    * the gated result is the observed map + the job's own output,
    * both replayed by the oracle as plain aggregates — a dropped
    * partition's metrics or a double-counted retry hash-fails. */
  def observedMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val obs = org.apache.spark.sql.Observation()
    val df = Tables.lineitem(s, d)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .as("sum_price_cents"),
        min(col("l_shipdate").cast("date").cast("string")).as("min_ship"),
        max(col("l_shipdate").cast("date").cast("string")).as("max_ship"))
    val kept = df.filter(col("l_quantity") > 25).count()
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long],
      m("sum_price_cents").asInstanceOf[Long],
      m("min_ship").asInstanceOf[String],
      m("max_ship").asInstanceOf[String], kept))
      .toDF("n_rows", "sum_price_cents", "min_ship", "max_ship", "n_kept")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "observed_metrics" -> observedMetrics _,
    "variant_ops"        -> variantOps _,
    "percentiles"        -> percentiles _,
    "percentiles_approx" -> percentilesApprox _,
    "null_funcs"         -> nullFuncs _,
    "try_funcs"          -> tryFuncs _,
    "array_ops"          -> arrayOps _,
    "setops_all"         -> setOpsAll _,
    "profile_lineitem"   -> profileLineitem _,
    "dq_checks"          -> dqChecks _,
    "json_map_funcs"     -> jsonMapFuncs _,
    "json_dirty_parse"   -> jsonDirtyParse _,
  )

  val oracle: Map[String, String] = Map(
    // the observed pass replayed as plain aggregates + the job's own
    // filtered count
    "observed_metrics" ->
      """SELECT count(*)::BIGINT AS n_rows,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |    AS sum_price_cents,
        |  min(l_shipdate::DATE)::VARCHAR AS min_ship,
        |  max(l_shipdate::DATE)::VARCHAR AS max_ship,
        |  (SELECT count(*) FROM lineitem WHERE l_quantity > 25)::BIGINT
        |    AS n_kept
        |FROM lineitem""".stripMargin,
    // the same multi-level paths via DuckDB JSON extraction; the
    // missing path is NULL for every row, the envelope type echoes
    // the event_type for every row
    "variant_ops" ->
      """SELECT event_type, count(*) AS n,
        |  sum(json_extract_string(props, '$.k')::INT)::BIGINT AS sum_k,
        |  min(json_extract_string(props, '$.k')::INT) AS min_k,
        |  max(json_extract_string(props, '$.k')::INT) AS max_k,
        |  0::BIGINT AS n_missing,
        |  count(*)::BIGINT AS n_type_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "percentiles_approx" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_exact,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "try_funcs" ->
      """SELECT c_custkey,
        |  round(CASE WHEN c_custkey % 7 = 0 THEN NULL
        |    ELSE c_acctbal / (c_custkey % 7) END, 4) AS div7,
        |  TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN c_acctbal::VARCHAR
        |    ELSE c_name END AS DOUBLE) AS cast_back,
        |  CASE WHEN c_custkey <= 1000
        |    THEN 9223372036854775807 - 1000 + c_custkey ELSE NULL
        |  END AS near_max
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "null_funcs" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_coalesced,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos,
        |  nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "array_ops" ->
      """WITH a AS (
        |  SELECT l_orderkey,
        |    list_sort(list(l_quantity)) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  len(qs) AS n,
        |  qs[1] AS q_min,
        |  qs[-1] AS q_max,
        |  round(list_sum(qs), 2) AS q_sum,
        |  round(list_sum(list_transform(qs, x -> x * 2.0)), 2) AS q2_sum,
        |  len(list_filter(qs, x -> x > 49.0)) > 0 AS has_big
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "dq_checks" ->
      """SELECT 'customer_key_duplicates' AS check_name,
        |  (SELECT count(*) FROM (SELECT c_custkey FROM customer
        |    GROUP BY c_custkey HAVING count(*) > 1)) AS violations,
        |  (SELECT count(*) FROM customer) AS checked
        |UNION ALL SELECT 'customers_without_orders',
        |  (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)),
        |  (SELECT count(*) FROM customer)
        |UNION ALL SELECT 'discount_out_of_range',
        |  (SELECT count(*) FROM lineitem
        |    WHERE l_discount < 0 OR l_discount > 1),
        |  (SELECT count(*) FROM lineitem)
        |UNION ALL SELECT 'lineitem_orphaned_orderkey',
        |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |  (SELECT count(*) FROM lineitem)
        |UNION ALL SELECT 'orders_custkey_null',
        |  (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
        |  (SELECT count(*) FROM orders)
        |UNION ALL SELECT 'orders_orphaned_custkey',
        |  (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |  (SELECT count(*) FROM orders)
        |ORDER BY check_name""".stripMargin,
    "profile_lineitem" ->
      """WITH s AS (SELECT
        |  count(*)::DOUBLE AS n_rows,
        |  count(DISTINCT l_orderkey)::DOUBLE AS orderkey_distinct,
        |  sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::DOUBLE
        |    AS quantity_nulls,
        |  round(min(l_quantity), 2) AS quantity_min,
        |  round(max(l_quantity), 2) AS quantity_max,
        |  ((2 * sum(CAST(l_quantity AS BIGINT)) * 10000 + count(*))
        |    // (2 * count(*))) / 10000.0 AS quantity_avg,
        |  round(stddev_samp(l_quantity), 4) AS quantity_std,
        |  round(min(l_extendedprice), 2) AS price_min,
        |  round(max(l_extendedprice), 2) AS price_max,
        |  ((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 100
        |    + count(*)) // (2 * count(*))) / 10000.0 AS price_avg,
        |  count(DISTINCT l_returnflag)::DOUBLE AS returnflag_distinct
        |FROM lineitem)
        |SELECT 'n_rows' AS metric, n_rows AS value FROM s
        |UNION ALL SELECT 'orderkey_distinct', orderkey_distinct FROM s
        |UNION ALL SELECT 'quantity_nulls', quantity_nulls FROM s
        |UNION ALL SELECT 'quantity_min', quantity_min FROM s
        |UNION ALL SELECT 'quantity_max', quantity_max FROM s
        |UNION ALL SELECT 'quantity_avg', quantity_avg FROM s
        |UNION ALL SELECT 'quantity_std', quantity_std FROM s
        |UNION ALL SELECT 'price_min', price_min FROM s
        |UNION ALL SELECT 'price_max', price_max FROM s
        |UNION ALL SELECT 'price_avg', price_avg FROM s
        |UNION ALL SELECT 'returnflag_distinct', returnflag_distinct FROM s
        |ORDER BY metric""".stripMargin,
    // the mangled seventh is invalid JSON on both engines; parsed
    // rows aggregate the single "k" key exactly as the Spark map does
    "json_dirty_parse" ->
      """WITH raw AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN 'corrupt::' || props
        |         ELSE props END AS raw
        |  FROM events)
        |SELECT event_type,
        |  count(*) AS n_rows,
        |  sum(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END)::BIGINT
        |    AS n_corrupt,
        |  sum(CASE WHEN json_valid(raw)
        |    THEN len(json_keys(raw)) ELSE 0 END)::BIGINT AS parsed_keys,
        |  sum(CASE WHEN json_valid(raw)
        |    THEN CAST(raw->>'k' AS BIGINT) END)::BIGINT AS sum_k
        |FROM raw GROUP BY event_type ORDER BY event_type""".stripMargin,
    "json_map_funcs" ->
      """WITH kv AS (
        |  SELECT event_type, props,
        |    unnest(json_keys(props)) AS key
        |  FROM events)
        |SELECT event_type, key,
        |  count(*) AS n,
        |  min(json_extract(props, '$.' || key)::INT) AS k_min,
        |  max(json_extract(props, '$.' || key)::INT) AS k_max,
        |  ((2 * sum(json_extract(props, '$.' || key)::BIGINT) * 10000
        |    + count(*)) // (2 * count(*))) / 10000.0 AS k_avg
        |FROM kv
        |GROUP BY event_type, key
        |ORDER BY event_type, key""".stripMargin,
    "setops_all" ->
      """WITH c AS (SELECT c_nationkey AS nk FROM customer),
        |     s AS (SELECT s_nationkey AS nk FROM supplier)
        |SELECT 'intersect_all' AS op, nk, count(*) AS n FROM
        |  (SELECT nk FROM c INTERSECT ALL SELECT nk FROM s) GROUP BY nk
        |UNION ALL
        |SELECT 'except_all', nk, count(*) FROM
        |  (SELECT nk FROM c EXCEPT ALL SELECT nk FROM s) GROUP BY nk
        |ORDER BY op, nk""".stripMargin,
  )
}
