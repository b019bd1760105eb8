package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import graft.operators._

/** Suite-wide plan-quality audit over the pure relational registry:
  * every query in these modules must plan WITHOUT a
  * `CartesianProductExec`. The engine's deliberate 1-row scalar
  * crossJoins plan as BroadcastNestedLoopJoin over a single-row build
  * side (bounded work), which this audit permits; an unintended
  * cartesian — a dropped join condition, a non-equi predicate that
  * silently fell out of an equi-join rewrite — plans as
  * CartesianProductExec and fails here BEFORE it reaches the driver's
  * correctness gate, where it would merely be slow-but-right at
  * sf0.01 and catastrophic at 100 TB.
  *
  * Scope: the modules whose query functions are lazy plan builders
  * (no store landing, no streaming drains) — auditing a streaming or
  * landed-store entry would execute it. */
class PlanAuditSpec extends SparkSpec {

  private val audited: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    RelOps.queries ++ TpchOps.queries ++ JoinOps.queries ++
      SqlSurface.queries ++ FuncOps.queries ++ ChangeOps.queries ++
      Retrieval.queries

  private def hasCartesian(p: SparkPlan): Boolean = p match {
    case a: AdaptiveSparkPlanExec => hasCartesian(a.executedPlan)
    case _: CartesianProductExec  => true
    case other                    => other.children.exists(hasCartesian)
  }

  test(s"no relational query plans a CartesianProduct (${audited.size} audited)") {
    val offenders = audited.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        if (hasCartesian(fn(spark, sfDir).queryExecution.executedPlan)) Some(name)
        else None
      } catch {
        // a query that cannot even plan is its own failure
        case e: Throwable => Some(s"$name (plan failed: ${e.getMessage.take(120)})")
      }
    }
    assert(offenders.isEmpty, s"cartesian or plan failure in: $offenders")
  }
}
