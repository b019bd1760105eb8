package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector — the sink half of the DSv2 rung
  * ([[SeqSource]] is the read half): a counting sink that exercises
  * the distributed COMMIT PROTOCOL end to end. Each task's
  * `DataWriter` folds its partition into (rows, sum of column 0) and
  * emits the pair as its `WriterCommitMessage`; the driver-side
  * `BatchWrite.commit` receives exactly one winning message per
  * partition (Spark's task-commit coordination — a speculative or
  * retried task's duplicate is aborted, never committed) and
  * aggregates them into the job result. The gate compares that
  * committed total against a plain aggregate of the same relation, so
  * a lost, duplicated, or double-committed partition message would
  * hash-fail the query.
  *
  * Scale shape: the sink is embarrassingly parallel (O(1) state per
  * task, one tiny message per partition to the driver) — the same
  * commit topology every production DSv2 writer (Iceberg/Delta-style)
  * uses for its file manifests. */
class CountSink extends TableProvider {
  // write-only source: the table adopts the incoming query's schema
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CountTable(schema, properties.get("runid"))
}

object CountSink {
  /** Committed totals per runid — the handoff from BatchWrite.commit
    * (driver side) back to the caller. */
  private[sources] val commits =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  def take(runId: String): Option[(Long, Long)] =
    Option(commits.remove(runId))
}

class CountTable(writeSchema: StructType, runId: String)
    extends Table with SupportsWrite {
  override def name: String = s"graftcount($runId)"
  override def schema: StructType = writeSchema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CountBatchWrite(runId)
      }
    }
}

case class CountMsg(rows: Long, sum: Long) extends WriterCommitMessage

class CountBatchWrite(runId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CountWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val totals = messages.foldLeft((0L, 0L)) { case ((r, s), m) =>
      val c = m.asInstanceOf[CountMsg]; (r + c.rows, s + c.sum)
    }
    CountSink.commits.put(runId, totals)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class CountWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1; sum += record.getLong(0)
      }
      override def commit(): WriterCommitMessage = CountMsg(rows, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
