package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-resistant two-stage aggregation (SURVEY.md §7.4's "salted
  * two-stage variants" rule).
  *
  * A hot key at 100 TB sends its entire group to one reduce task; the
  * classic fix salts the key into `buckets` sub-keys, partially
  * aggregates, then de-salts and finishes. For algebraic aggregates
  * Spark's own partial aggregation already bounds skew per *map
  * partition*, but the FINAL aggregation still lands each key on one
  * task — salting bounds that too (e.g. distinct-like or
  * collect-style payloads where the final combine is heavy).
  *
  * AQE's skew-join splitting handles the join case
  * (`spark.sql.adaptive.skewJoin.enabled`); this helper covers the
  * aggregation case, which AQE does not rebalance.
  */
object SaltedAgg {

  /** sum(valueCol) by keyCols, salted into `buckets` partial groups.
    * Deterministic result (addition is the only reorder, same as any
    * shuffle); identical to a direct groupBy().sum() — proven by
    * SaltedAggSpec. */
  def sumSalted(df: DataFrame, keyCols: Seq[String], valueCol: String,
                buckets: Int = 16): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(crc32(concat_ws("\u0000",
        keyCols.map(col) :+ monotonically_increasing_id().cast("string"): _*)),
        lit(buckets)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
    salted
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__partial").as(s"sum_$valueCol"))
  }

  /** count-distinct by key with salting on the DISTINCT column — the
    * two-level expansion that keeps a hot key's distinct-set build
    * parallel: stage 1 dedups (key, value) pairs across `buckets`
    * tasks, stage 2 counts. */
  def countDistinctSalted(df: DataFrame, keyCols: Seq[String],
                          distinctCol: String): DataFrame = {
    df.select((keyCols.map(col) :+ col(distinctCol)): _*)
      .distinct() // shuffles on (key, value) — no single-task hot key
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(s"n_distinct_$distinctCol"))
  }

  /** The salted path under the driver gate: corpus word frequencies —
    * a naturally Zipf-skewed key domain ("the" carries orders of
    * magnitude more rows than the median word) — summed through the
    * two-stage salted aggregate. Result is identical to the direct
    * groupBy (addition is the only reorder), so it shares wordcount's
    * oracle; the plan carries the (word, __salt) partial exchange
    * (asserted in PlanSpec). */
  def wordcountSalted(s: SparkSession, d: String): DataFrame =
    sumSalted(
      TextOps.tokenize(Tables.documents(s, d)).withColumn("one", lit(1L)),
      Seq("word"), "one")
      .select(col("word"), col("sum_one").as("cnt"))
      .orderBy("word")

  /** Final adaptive plan of the last [[skewJoinAqe]] materialization —
    * read by PlanSpec to assert the skew split actually fired (the
    * returned DataFrame is a parquet read-back, so the interesting
    * plan is gone by the time a caller could look). */
  @volatile private[graft] var lastSkewJoinPlan: String = ""

  /** AQE skew-join demonstration under the driver gate: lineitem is
    * given a deliberately hot foreign key (22 of 25 l_partkey residues
    * collapse to nation key 0 → ~88% of the fact side in ONE join
    * partition) and joined to `nation` as a shuffle join — broadcast
    * is disabled for the scope, because a broadcast join would simply
    * hide the skew rather than handle it (and at 100 TB the dim side
    * of a skewed join is not always broadcastable). AQE's
    * OptimizeSkewedJoin then splits the oversized partition into
    * advisory-sized reads (thresholds here are sized to the test SF;
    * at production scale the 256 MB defaults do the same job). The
    * join is materialized inside the conf scope so the gate row
    * reflects the adaptive execution, and the result is served from
    * the landed parquet. Conf changes are try/finally-restored. */
  def skewJoinAqe(s: SparkSession, d: String): DataFrame = {
    val overrides = Seq(
      "spark.sql.autoBroadcastJoinThreshold"                        -> "-1",
      "spark.sql.adaptive.skewJoin.enabled"                         -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"           -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"             -> "2KB",
      // the split is worth an extra downstream exchange here; don't
      // let the planner veto it on that basis
      "spark.sql.adaptive.forceOptimizeSkewedJoin"                  -> "true",
      // coalescing first would re-merge the split reads at this scale
      "spark.sql.adaptive.coalescePartitions.enabled"               -> "false")
    val prev = overrides.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      overrides.foreach { case (k, v) => s.conf.set(k, v) }
      val hk = when(pmod(col("l_partkey"), lit(25)) < 22, lit(0L))
        .otherwise(pmod(col("l_partkey"), lit(25)).cast("long"))
      // AQE splits a skewed partition at MAP-OUTPUT granularity; the
      // single-row-group test parquet yields exactly one data-bearing
      // scan task, which makes the hot partition one indivisible block
      // (verified: createSkewPartitionSpecs returns None). The
      // round-robin repartition manufactures the many-map state a real
      // cluster is always in — at 100 TB thousands of scan tasks feed
      // the join shuffle and this line would be dropped.
      val joined = Tables.lineitem(s, d).withColumn("hk", hk)
        .repartition(32)
        .join(Tables.nation(s, d), col("hk") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"),
          (sum(Money.cents(col("l_extendedprice"))) / 100.0).as("revenue"))
      // collect() executes THIS QueryExecution, so AQE finalizes the
      // plan we record (df.write would spawn its own execution and
      // leave this one un-run); the landed table is rebuilt from the
      // 25 collected rows — no second distributed pass.
      val rows = joined.collect()
      lastSkewJoinPlan = joined.queryExecution.executedPlan.toString
      // processScoped: parquet overwrite = delete-then-write, so a
      // shared path lets a concurrent JVM's reader see the gap
      val out = graft.Scratch.processScoped("graft_skew",
        "skew_join_aqe").toString
      s.createDataFrame(java.util.Arrays.asList(rows: _*), joined.schema)
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .transform(Present.sortedUnbounded(_, col("n_name")))
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordcount_salted" -> wordcountSalted _,
    "skew_join_aqe"    -> skewJoinAqe _,
  )

  /** Same contract as the direct wordcount — the point is the salted
    * two-stage plan reproduces it exactly. */
  val oracle: Map[String, String] = Map(
    "wordcount_salted" -> TextOps.oracle("wordcount"),
    "skew_join_aqe" ->
      """SELECT n_name, count(*) AS n_items,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem JOIN nation
        |  ON (CASE WHEN l_partkey % 25 < 22 THEN 0
        |      ELSE l_partkey % 25 END) = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
  )
}
