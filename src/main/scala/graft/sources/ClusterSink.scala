package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 sink that DEMANDS layout from the engine —
  * `RequiresDistributionAndOrdering`, the write-side twin of the
  * read-side `SupportsReportPartitioning`: the Write declares
  * "cluster by `k`, sort by `k` within partitions, use exactly
  * `parts` tasks", and Spark inserts the exchange + sort for it. This
  * is how production table formats get well-formed files WITHOUT the
  * query author repartitioning by hand (Iceberg's write distribution
  * modes): at 100 TB the difference between one declared clustered
  * write and a user-forgotten `repartition()` is a table of
  * one-row-group-per-key files vs. a million interleaved fragments.
  *
  * The sink VERIFIES what it was promised while streaming, and the
  * verdicts ride the commit protocol: each task checks its rows
  * arrive non-decreasing by `k` (ordering) and records its distinct
  * key set (bounded here by the clustering domain of the registered
  * query, ≤101 keys — the same order of metadata a manifest writer
  * ships as file stats); the driver-side commit checks no key landed
  * in two partitions (clustering) and folds totals. A missing
  * exchange, a dropped sort, or a duplicated commit message all
  * hash-fail the gated query. */
class ClusterSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new ClusterTable(schema, properties.get("runid"),
      properties.getOrDefault("parts", "7").toInt)
}

object ClusterSink {
  /** rows, sum(v), union-of-keys size, Σ per-part keys, parts,
    * per-task ordering verdict — the driver-commit handoff. */
  case class Committed(rows: Long, sumV: Long, nKeys: Long,
                       sumPartKeys: Long, parts: Int, ordered: Boolean)
  private[sources] val commits =
    new java.util.concurrent.ConcurrentHashMap[String, Committed]()
  def take(runId: String): Option[Committed] =
    Option(commits.remove(runId))
}

class ClusterTable(writeSchema: StructType, runId: String, parts: Int)
    extends Table with SupportsWrite {
  override def name: String = s"graftcluster($runId)"
  override def schema: StructType = writeSchema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new ClusterWrite(runId, parts)
    }
}

class ClusterWrite(runId: String, parts: Int)
    extends Write with RequiresDistributionAndOrdering {
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("k")))
  // exact task count: deterministic parallelism for the gate (empty
  // partitions still commit a message, so messages.length == parts)
  override def requiredNumPartitions(): Int = parts
  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.column("k"),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
  override def toBatch: BatchWrite = new ClusterBatchWrite(runId)
}

case class ClusterMsg(rows: Long, sumV: Long, keys: Array[Long],
                      ordered: Boolean) extends WriterCommitMessage

class ClusterBatchWrite(runId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ClusterWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[ClusterMsg])
    val union = ms.iterator.flatMap(_.keys).toSet
    ClusterSink.commits.put(runId, ClusterSink.Committed(
      rows = ms.map(_.rows).sum,
      sumV = ms.map(_.sumV).sum,
      nKeys = union.size.toLong,
      sumPartKeys = ms.map(_.keys.length.toLong).sum,
      parts = ms.length,
      ordered = ms.forall(_.ordered)))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class ClusterWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sumV = 0L
      private var prevK = Long.MinValue
      private var ordered = true
      private val keys = scala.collection.mutable.SortedSet.empty[Long]
      override def write(record: InternalRow): Unit = {
        val k = record.getLong(0)
        if (k < prevK) ordered = false
        prevK = k
        keys += k
        rows += 1; sumV += record.getLong(1)
      }
      override def commit(): WriterCommitMessage =
        ClusterMsg(rows, sumV, keys.toArray, ordered)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
