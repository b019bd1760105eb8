package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data-capture shapes over the `events` log — the operations a
  * warehouse ingesting a 100 TB append-only feed runs to serve "current
  * state" and "state history" queries (north-star surface; the
  * reference's log-shaped inputs stop at wordcount — its per-record
  * map pass is `Worker/Worker.py:10-26`).
  *
  * Both operators treat (user_id, event_type) as the logical entity key
  * and (ts, event_id) as the total version order — event_id breaks ts
  * ties, so results are deterministic on both engines.
  */
object ChangeOps {

  /** Change-log compaction: the LATEST record per key. Implemented as
    * `max_by` over the total ordering key rather than a row_number
    * window: the aggregate applies partially map-side (each input
    * partition emits at most one row per key into the shuffle), where a
    * window must shuffle EVERY version of every key and sort whole
    * partitions. At 100 TB of mostly-superseded versions the partial
    * aggregate is the difference between shuffling the corpus and
    * shuffling roughly the key domain. */
  def latestEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(max_by(
        struct(col("event_id"), col("ts"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("last_event_id"),
        col("last.ts").as("last_ts"),
        col("last.value").as("last_value"))
      .transform(Present.sortedUnbounded(_, col("user_id"), col("event_type")))

  /** SCD2-style validity intervals: each version holds from its own ts
    * until the next version's ts (NULL valid_to = current version).
    * One window pass keyed on the entity — the shuffle is on
    * (user_id, event_type) and each partition sorts only its own
    * versions; there is no self-join (the naive interval construction)
    * and no global sort. */
  def scd2Events(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("value"))
      .transform(Present.sortedUnbounded(_,
        col("user_id"), col("event_type"), col("valid_from"), col("event_id")))
  }

  /** Time-series resampling with gap fill: per-user hourly grid from
    * first to last observed hour, observed hours aggregate, missing
    * hours carry the last observation forward (the feature-pipeline
    * "align ragged event times to a regular grid" step).
    *
    * Shape at scale: the hourly aggregate is one shuffle on
    * (user, hour) with map-side partials; the grid is a narrow
    * per-user sequence explode (rows ∝ key span, not input volume);
    * the fill is one window pass keyed on user. No self-join, no
    * as-of join against the grid — `last(ignoreNulls)` over the
    * left-joined grid does the carry-forward in a single sorted
    * partition pass. First grid hour per user always has an
    * observation (the grid starts AT the first event's hour), so the
    * fill never emits null. */
  def resampleEvents(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(sum("value"), 3).as("v"))
    val grid = hourly
      .groupBy("user_id")
      .agg(min("hour").as("h0"), max("hour").as("h1"))
      // spread the per-user bounds BEFORE the explode: the bounds
      // relation is key-count-sized (KBs), so AQE's byte-based
      // coalescing collapses the agg's exchange to ONE partition —
      // and the explode then fans the whole hour grid (rows ∝ Σ user
      // spans, 1M+ at sf0.1) out of a SINGLE task, serializing the
      // join+fill downstream too (measured 1.4 s of this query's
      // 2.1 s). The spread must be a keyless round-robin with an
      // explicit width: a user_id-keyed repartition is partitioning-
      // equal to the agg's requirement, so Catalyst collapses it into
      // the same AQE-coalescible exchange (verified in the plan) —
      // byte-based coalescing cannot see that the stage's real cost
      // is the generate's OUTPUT, not its input bytes.
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hour")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        last(col("v"), ignoreNulls = true).over(w).as("value"),
        col("v").isNull.as("is_gap"))
      .transform(Present.sortedUnbounded(_, col("user_id"), col("hour")))
  }

  /** Cohort retention: users grouped by first-seen week; for each
    * cohort, how many distinct users were active N weeks later. The
    * canonical product-analytics rollup: two aggregates and one join,
    * all keyed on user/week — no self-join over the event log (the
    * naive formulation), so cost is two shuffles on user plus one on
    * the B-sized (cohort, offset) pair. Weeks are date_trunc ISO
    * Mondays on both engines. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val firstSeen = ev.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).cast("date").as("cohort_week"))
    val active = ev
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
    active.join(firstSeen, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("weeks_since"))
      .agg(countDistinct("user_id").as("n_users"))
      .transform(Present.sorted(_, col("cohort_week"), col("weeks_since")))
  }

  /** Ordered funnel analysis — the product-analytics staple: how many
    * users performed view → click → purchase IN THAT ORDER, where
    * each step must occur strictly after the user's first qualifying
    * occurrence of the previous step (t1 = first view; t2 = first
    * click after t1; t3 = first purchase after t2).
    *
    * ONE user_id shuffle computes the whole funnel: the log is
    * filtered map-side to the three step types, and the chained
    * per-user firsts are same-partitioned unbounded window
    * aggregates — Catalyst plans all three (plus the per-user
    * collapse, which the window partitioning already satisfies) over
    * a single exchange, where the naive per-stage join chain pays a
    * shuffle per step (PlanSpec pins exchange count = 1 and no
    * join). The three stage counts then reduce to one row, and the
    * step-1 count is the conversion denominator. */
  def funnelEvents(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val c = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_type", "ts")
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(
        col("event_type") === "click" && col("ts") > col("t1"),
        col("ts"))).over(w))
      .withColumn("t3", min(when(
        col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(w))
      .groupBy("user_id")
      .agg(first("t1").as("t1"), first("t2").as("t2"), first("t3").as("t3"))
      .agg(sum(col("t1").isNotNull.cast("long")).as("u1"),
        sum(col("t2").isNotNull.cast("long")).as("u2"),
        sum(col("t3").isNotNull.cast("long")).as("u3"))
    c.select(explode(array(
        struct(lit(1).as("step"), lit("view").as("step_name"),
          col("u1").as("users")),
        struct(lit(2).as("step"), lit("click").as("step_name"),
          col("u2").as("users")),
        struct(lit(3).as("step"), lit("purchase").as("step_name"),
          col("u3").as("users")))).as("s"), col("u1"))
      .select(col("s.step").as("step"), col("s.step_name").as("step_name"),
        col("s.users").as("users"),
        round(col("s.users").cast("double") / col("u1"), 4)
          .as("rate_from_first"))
      .transform(Present.sorted(_, col("step")))
  }

  /** Sliding (overlapping) time windows — the batch twin of a
    * sliding-window stream: 6-hour windows every 3 hours, so each
    * event lands in exactly duration/slide = 2 windows. Spark's
    * `window()` expands rows to their windows BEFORE the partial
    * aggregate (an Expand, like rollup), so the shuffle carries at
    * most |windows|×|types| rows per task regardless of input size.
    * Epoch-aligned starts and ×100 fixed-point value sums make the
    * replay engine-exact (the q9 rounding discipline). */
  def slidingWindows(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .transform(Present.sortedUnbounded(_, col("w_start"), col("event_type")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_events" -> funnelEvents _,
    "sliding_windows" -> slidingWindows _,
    "latest_events" -> latestEvents _,
    "scd2_events"   -> scd2Events _,
    "resample_events" -> resampleEvents _,
    "cohort_retention" -> cohortRetention _,
  )

  val oracle: Map[String, String] = Map(
    // every event belongs to exactly two epoch-aligned 3h-slide
    // starts: floor3h(ts) and floor3h(ts) - 3h
    "sliding_windows" ->
      """WITH wins AS (
        |  SELECT event_type, value,
        |    unnest([b, b - INTERVAL 3 HOUR]) AS w_start
        |  FROM (
        |    SELECT event_type, value,
        |      CAST(to_timestamp(CAST(floor(epoch(ts) / 10800) * 10800
        |        AS BIGINT)) AS TIMESTAMP) AS b
        |    FROM events))
        |SELECT w_start, event_type, count(*) AS n,
        |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
        |FROM wins GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "funnel_events" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1),
        |s AS (
        |  SELECT 1 AS step, 'view' AS step_name,
        |    (SELECT count(*) FROM v) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p))
        |SELECT step, step_name, users::BIGINT AS users,
        |  round(users::DOUBLE / (SELECT count(*) FROM v), 4)
        |    AS rate_from_first
        |FROM s ORDER BY step""".stripMargin,
    "latest_events" ->
      """SELECT user_id, event_type, event_id AS last_event_id,
        |  ts AS last_ts, value AS last_value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events) t
        |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin,
    "scd2_events" ->
      """SELECT user_id, event_type, event_id, ts AS valid_from,
        |  lead(ts, 1) OVER w AS valid_to,
        |  lead(ts, 1) OVER w IS NULL AS is_current, value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        |ORDER BY user_id, event_type, valid_from, event_id""".stripMargin,
    "resample_events" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour,
        |    round(sum(value), 3) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |  FROM hourly GROUP BY 1),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.hour, h.v
        |  FROM grid g LEFT JOIN hourly h
        |    ON g.user_id = h.user_id AND g.hour = h.hour)
        |SELECT user_id, hour,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  v IS NULL AS is_gap
        |FROM j ORDER BY user_id, hour""".stripMargin,
    "cohort_retention" ->
      """WITH first_seen AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        |  FROM events)
        |SELECT f.cohort_week,
        |  (datediff('day', f.cohort_week, a.week) // 7)::INTEGER
        |    AS weeks_since,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN first_seen f ON a.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, weeks_since""".stripMargin,
  )
}
