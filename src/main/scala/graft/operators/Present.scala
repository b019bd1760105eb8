package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic presentation sort for oracle-compared outputs.
  *
  * Two forms, chosen by whether the OUTPUT is bounded:
  *
  *   - `sorted` — bounded outputs (top-k, group-by over a fixed key
  *     domain, constant-capped samples): a round-robin shuffle to one
  *     partition + `sortWithinPartitions`. `orderBy` would plan a
  *     range-partitioned global sort whose `RangePartitioner` SAMPLES
  *     the child — executing the entire upstream plan a second time.
  *     For a heavy upstream feeding k rows, the single-task final sort
  *     is free and the saved second execution is not.
  *
  *   - `sortedUnbounded` — O(input)-row outputs (per-document scores,
  *     joins, sessionization): a real `orderBy`. Range partitioning
  *     keeps the sort parallel — at 100 TB a single-task sort of an
  *     O(N) result IS the bottleneck, and the sampling pass is a
  *     bounded price (the upstream runs twice, both times parallel).
  *     The sort order is total (callers pass tie-breaking keys), so
  *     the driver's row-by-row hash compare stays deterministic:
  *     range partitions concatenate in key order.
  *
  * This is a SINK choice, not an operator choice: at 100 TB you would
  * not globally sort at all — the order exists solely so the driver's
  * row-by-row hash compare is deterministic.
  */
object Present {
  def sorted(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  def sortedUnbounded(df: DataFrame, cols: Column*): DataFrame =
    df.orderBy(cols: _*)
}
