package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Join-shape coverage beyond the inner/semi/anti set in RelOps:
  * outer joins, range (interval) join, and as-of join.
  *
  * The reference has no joins at all (SURVEY.md §2.3 — InvertedIndex
  * carries provenance through map instead); these are the north-star
  * relational surface, each chosen with a 100 TB plan shape:
  *   - left/full outer: plain shuffled joins — Spark handles these
  *     natively; the interesting part is null-side semantics, which
  *     the oracle checks.
  *   - range join: the small side (a static tier table) is BROADCAST,
  *     so the fact side never shuffles — the only sane plan for
  *     fact ⋈ tiny-interval-table at scale.
  *   - as-of join: NOT implemented as an inequality join (which
  *     explodes quadratically per key) but as a single window pass
  *     over the tagged union — one shuffle on the key, linear work.
  */
object JoinOps {

  /** LEFT OUTER: every customer with their urgent-order count; the
    * right side is filtered BEFORE the join so ~10% of customers
    * genuinely have no match and surface the null → 0 path. */
  def joinLeft(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"))
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("n"), lit(0L)).as("n_urgent"),
        col("n").isNull.as("no_urgent"))
      .transform(Present.sortedUnbounded(_, col("c_custkey")))
  }

  /** FULL OUTER: order counts (custkey ∈ [100, 300)) vs event counts
    * (user_id ∈ [0, 150)) on the shared key domain — both sides have
    * guaranteed orphans, so left-null and right-null paths are both
    * exercised and oracle-checked. */
  def joinFullOuter(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_custkey") >= 100 && col("o_custkey") < 300)
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val ev = Tables.events(s, d)
      .groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("n_events"))
    ord.join(ev, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .transform(Present.sortedUnbounded(_, col("k")))
  }

  /** Static quantity tiers for the range join — in production this is
    * any small interval/dimension table (rate cards, SLA windows). */
  private val tiers = Seq(
    ("low", 1, 10), ("mid", 10, 25), ("high", 25, 40), ("top", 40, 51))

  /** RANGE JOIN: lineitem ⋈ tiers ON lo <= qty < hi. The tier table
    * is broadcast, so the plan is a BroadcastNestedLoopJoin over a
    * streamed fact scan — zero fact-side shuffle before the final
    * per-tier aggregate (4 groups). */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = tiers.toDF("tier", "lo", "hi")
    Tables.lineitem(s, d)
      .join(broadcast(t),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy("tier")
      .agg(count(lit(1)).as("n"),
        Money.money2(sum(Money.revCents4)).as("revenue"))
      .transform(Present.sorted(_, col("tier")))
  }

  /** AS-OF JOIN: each purchase event paired with the latest click at
    * or before it by the same user (NULL if none yet).
    *
    * Implemented as a window pass over the tagged union: sort each
    * user's clicks+purchases by time, carry the last click timestamp
    * forward (`last(..., ignoreNulls)`), emit only purchases. One
    * shuffle on user_id, linear in events — the inequality-join
    * formulation this replaces is O(clicks × purchases) per user.
    * Tie rule: a click at exactly the purchase timestamp counts
    * (sorted before the purchase), matching DuckDB ASOF `>=`. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // at equal ts: "click" < "purchase" lexically → click sorts first
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_type"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .transform(Present.sortedUnbounded(_, col("event_id")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_left"       -> joinLeft _,
    "join_full_outer" -> joinFullOuter _,
    "range_join"      -> rangeJoin _,
    "asof_join"       -> asofJoin _,
  )

  val oracle: Map[String, String] = Map(
    "join_left" ->
      """WITH u AS (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT c_custkey,
        |  coalesce(n, 0) AS n_urgent,
        |  n IS NULL AS no_urgent
        |FROM customer LEFT JOIN u ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "join_full_outer" ->
      """WITH o AS (
        |  SELECT o_custkey AS k, count(*) AS n_orders FROM orders
        |  WHERE o_custkey >= 100 AND o_custkey < 300 GROUP BY 1),
        |e AS (SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT coalesce(o.k, e.k) AS k,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(n_events, 0) AS n_events
        |FROM o FULL OUTER JOIN e ON o.k = e.k
        |ORDER BY k""".stripMargin,
    "range_join" ->
      """WITH tiers(tier, lo, hi) AS (VALUES
        |  ('low', 1, 10), ('mid', 10, 25), ('high', 25, 40), ('top', 40, 51))
        |SELECT tier, count(*) AS n,
        |  ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |    AS BIGINT)) + 50) // 100) / 100.0 AS revenue
        |FROM lineitem JOIN tiers ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY tier ORDER BY tier""".stripMargin,
    "asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts, c.ts AS click_ts,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
  )
}
