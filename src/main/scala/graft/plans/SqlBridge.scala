package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal compile-time bridge into `private[sql] Dataset.ofRows`,
  * the only way to hand a custom logical node (graft.plans
  * .TopKPerKeyPlan) to the session for analysis/planning. Living in
  * `org.apache.spark.sql` solely for access — the standard wiring
  * for Spark extension libraries that construct their own plans; no
  * Spark internals are modified or shadowed. Kept to one forwarding
  * method so the internal surface this project depends on stays
  * auditable. */
object GraftSqlBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)
}
