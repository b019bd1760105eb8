package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic presentation sort for oracle-compared outputs.
  *
  * `orderBy` plans a range-partitioned global sort, and
  * `RangePartitioner` SAMPLES the child to pick bounds — executing the
  * entire upstream plan a second time. For a heavy upstream (self-join
  * + aggregation) feeding a small, presentation-only ordered output,
  * that doubles the query. A round-robin shuffle to one partition +
  * `sortWithinPartitions` gives the same total order with the upstream
  * computed exactly once (the computation itself stays fully
  * parallel; only the final k rows funnel to one task).
  *
  * This is a SINK choice, not an operator choice: at 100 TB you would
  * not globally sort at all — the order exists solely so the driver's
  * row-by-row hash compare is deterministic. Large ordered outputs
  * that must scale (none in the current inventory) would keep
  * `orderBy` and accept the sampling pass.
  */
object Present {
  def sorted(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
