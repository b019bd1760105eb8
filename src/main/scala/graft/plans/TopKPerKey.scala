package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension — the (c) rung of SURVEY.md §4.2's ladder
  * that [[FuseCosine]]'s expression rewrite stops short of: a custom
  * logical node, a `SparkStrategy` that plans it, and a physical
  * operator with its own distribution contract and execution.
  *
  * Semantics: the first `k` rows per distinct `keys` value under
  * `order` (a total order when callers include a tie-break column,
  * which the registered query does).
  *
  * Why an operator and not the window form: `row_number() ≤ k`
  * SORTS every key's entire row set inside each partition (Spark's
  * rank-limit pushdown prunes rows map-side but still sorts and
  * re-runs the window after the shuffle). This operator keeps a
  * bounded heap per key — O(keys × k) memory, O(n log k) time, no
  * sort of the input, and exactly one clustering exchange — the
  * per-key-top-k cost profile you want when k ≪ rows-per-key at
  * 100 TB. Result-identical to the window form (PlanSpec pins both
  * the plan shape and row equality; the driver gate hash-checks it
  * against DuckDB's row_number form).
  *
  * Memory honesty: per-task state is keys-in-task × k rows — the
  * same order as a hash aggregate's pre-spill state, but WITHOUT a
  * spill path. When per-task key cardinality × k outgrows executor
  * memory, use the window form (whose sort spills) or raise the key
  * partition count; the operator targets the common regime where
  * the per-key result set is the small side.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyPlan = copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] into [[TopKPerKeyExec]]; injected via
  * `spark.experimental.extraStrategies` (public API, no session
  * rebuild needed) — `SparkSessionExtensions.injectPlannerStrategy`
  * is the equivalent wiring for sessions built from scratch. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      // partial/final pair, exactly like a two-phase aggregate: a row
      // outside its map partition's top k cannot be in the global
      // top k, so the partial pass bounds what the exchange carries
      // to keys × k rows PER MAP TASK
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true),
        partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: SparkPlan,
                          partial: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  /** Final pass: all surviving rows of a key must meet in one task —
    * one hash exchange on `keys` (or zero if the child is already
    * clustered, e.g. a bucketed scan). Partial pass: runs wherever
    * the data is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** Clustering is preserved: downstream per-key operators reuse the
    * exchange instead of re-shuffling. */
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val attrs = child.output
    val kk = k
    child.execute().mapPartitions({ iter =>
      // codegen'd projections/orderings are built ON THE EXECUTOR —
      // they are not serializable; only the expressions travel
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      val ord = RowOrdering.create(sortOrder, attrs)
      // heap head = the WORST kept row (reverse ordering), so one
      // peek decides admission and one poll evicts
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), q) // the projection reuses its buffer
        }
        if (q.size < kk) q.add(row.copy()) // iterators reuse row buffers
        else if (ord.compare(row, q.peek()) < 0) {
          q.poll(); q.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { q =>
        val arr = q.toArray(new Array[InternalRow](q.size))
        java.util.Arrays.sort(arr, ord) // k elements — emit in order
        arr.iterator
      }
    }, preservesPartitioning = true)
  }
}
