package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Join
import graft.sources.StorageOps

/** The CBO rung: landed `ANALYZE … FOR ALL COLUMNS` statistics must
  * (a) let cost-based join reorder rewrite a deliberately bad
  * declared order — the selective dim joined LAST in source code
  * moves innermost, where its filter cuts the fact before the
  * fact⋈fact step — and (b) win the dim a broadcast with NO
  * `broadcast()` hint anywhere, from estimated (not file) sizes.
  * The no-CBO twin pins that the declared order otherwise survives,
  * and that reordering never changes the answer. */
class CboSpec extends SparkSpec {

  private def innermostJoin(df: org.apache.spark.sql.DataFrame): Join = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size == 2, s"expected 2 joins, got ${joins.size}")
    joins.last // collect is pre-order: last = innermost
  }

  test("column stats land in the catalog with row counts and ndv") {
    StorageOps.ensureCboStats(spark, sfDir)
    val desc = spark.sql(
      "DESCRIBE EXTENDED graft_wh_part p_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("distinct_count").exists(_.toLong > 0),
      s"no ndv landed for p_type: $desc")
    // table-level stats live in the catalog (plan-level .stats hides
    // rowCount unless the ACTIVE thread conf has CBO on, so read the
    // catalog record directly)
    val nParts = Tables.part(spark, sfDir).count()
    val tstats = spark.sql("DESCRIBE TABLE EXTENDED graft_wh_part")
      .collect().find(_.getString(0) == "Statistics").map(_.getString(1))
    assert(tstats.exists(_.contains(s"$nParts rows")),
      s"catalog row count stat missing: $tstats")
  }

  test("cbo + stats reorder the declared join; no-CBO twin keeps it") {
    StorageOps.ensureCboStats(spark, sfDir)
    // no CBO (session default): the declared fact⋈fact stays innermost
    val plain = StorageOps.cboJoinBody(spark)
    val innerPlain = innermostJoin(plain).toString
    assert(innerPlain.contains("graft_wh_orders") &&
      !innerPlain.contains("graft_wh_part"),
      s"declared order did not survive without CBO:\n$innerPlain")
    // CBO: the part dim — selective only per its p_type ndv stats —
    // must move innermost so its filter cuts lineitem first
    val df = StorageOps.cboJoinReorder(spark, sfDir)
    val inner = innermostJoin(df).toString
    assert(inner.contains("graft_wh_part"),
      s"CBO did not reorder the selective dim innermost:\n$inner")
    // and the dim side broadcasts with no hint in the query
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"stats did not win the dim a broadcast:\n$p")
    // reordering is plan-only: both orders agree row for row
    assert(df.collect().toSeq == plain.collect().toSeq)
  }
}
