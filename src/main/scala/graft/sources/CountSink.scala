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

  /** Streaming path: totals per (runid, epoch). Keying by epoch makes
    * a replayed epoch's re-commit IDEMPOTENT (put overwrites the same
    * key) — the connector-side half of exactly-once. */
  private[sources] val epochCommits =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), (Long, Long)]()
  /** Drain a stream run: (rows, sum, non-empty epoch count). */
  def takeStream(runId: String): (Long, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val keys = epochCommits.keySet.asScala.filter(_._1 == runId).toSeq
    val vals = keys.flatMap(k => Option(epochCommits.remove(k)))
    (vals.map(_._1).sum, vals.map(_._2).sum, vals.count(_._1 > 0).toLong)
  }
}

class CountTable(writeSchema: StructType, runId: String)
    extends Table with SupportsWrite {
  override def name: String = s"graftcount($runId)"
  override def schema: StructType = writeSchema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new CountBatchWrite(runId)
        override def toStreaming: streaming.StreamingWrite =
          new CountStreamingWrite(runId)
      }
    }
}

/** The STREAMING write half: same per-task fold, but the commit
  * protocol is EPOCH-ed — every micro-batch commits (epochId,
  * messages) on the driver, and the sink stores totals keyed by
  * epoch so a replayed epoch (failure recovery re-runs the last
  * uncommitted batch) overwrites instead of double-counting: the
  * connector side of Structured Streaming's exactly-once contract.
  * With the [[SeqSource]] micro-batch read feeding it, this closes
  * the full DSv2 loop — connector-to-connector streaming with offset
  * tracking on the source and epoch commits on the sink. */
class CountStreamingWrite(runId: String)
    extends streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        new CountWriter
    }
  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val totals = messages.foldLeft((0L, 0L)) { case ((r, s), m) =>
      val c = m.asInstanceOf[CountMsg]; (r + c.rows, s + c.sum)
    }
    CountSink.epochCommits.put((runId, epochId), totals)
  }
  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = ()
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
    new CountWriter
}

class CountWriter extends DataWriter[InternalRow] {
  private var rows = 0L
  private var sum = 0L
  override def write(record: InternalRow): Unit = {
    rows += 1; sum += record.getLong(0)
  }
  override def commit(): WriterCommitMessage = CountMsg(rows, sum)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
