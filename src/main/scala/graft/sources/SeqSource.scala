package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector — the SOURCES rung of the extension
  * ladder (alongside the native `Expression`, the optimizer `Rule`,
  * and the `SparkStrategy`+`SparkPlan` operator): a deterministic
  * generated table `graftseq` wired through the full DSv2 read
  * protocol. The reference's storage layer is a bespoke chunk store
  * read through custom RPC (`KeyValueStore/KeyValueStore.py:13-59`,
  * `Master/Master.py:195-254`); the Spark-native analogue of "teach
  * the engine a new storage system" is exactly this interface, and
  * unlike a wrapped RDD it participates in Catalyst: required-column
  * pruning, id-range filter pushdown (EXACT — accepted filters are
  * consumed, not re-evaluated), and partition planning all reach the
  * scan.
  *
  * Rows: id ∈ [0, n); bucket = md5-60("seq"+id) % 100 (the engine's
  * standard engine-neutral hash, so DuckDB replays content exactly);
  * word = "w" + id%50. Options: n (rows), parts (target split count).
  *
  * Scale shape: `planInputPartitions` splits the SURVIVING id range
  * after pushdown, so a selective id predicate prunes whole splits
  * before any task launches (the generated-source analogue of
  * partition pruning); each split streams rows with O(1) state. */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new SeqTable(properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt,
      properties.getOrDefault("batchrows", "30000").toLong)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("word", StringType, nullable = false)))

  /** md5-60 of "seq"+id, mod 100 — Dedup.md5Hash60's semantics on the
    * JVM side so the SQL twin is the usual ('0x' || substring(md5(…),
    * 1, 15))::BIGINT % 100. */
  def bucketOf(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"seq$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 100L
  }
}

class SeqTable(n: Long, parts: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name: String = s"graftseq(n=$n)"
  override def schema: StructType = SeqSource.schema
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, parts, batchRows)
}

/** Folds id-range predicates into [lo, hi) at PLANNING time; every
  * accepted filter is exact (no post-scan re-evaluation), everything
  * else is handed back to Spark. */
class SeqScanBuilder(n: Long, parts: Int, batchRows: Long = 30000L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = n
  private var accepted = Array.empty[Filter]
  private var required = SeqSource.schema

  private def isId(att: String): Boolean = att.equalsIgnoreCase("id")

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo(a, _: java.lang.Long | _: java.lang.Integer) => isId(a)
      case GreaterThan(a, _: java.lang.Long | _: java.lang.Integer) => isId(a)
      case GreaterThanOrEqual(a, _: java.lang.Long | _: java.lang.Integer) => isId(a)
      case LessThan(a, _: java.lang.Long | _: java.lang.Integer) => isId(a)
      case LessThanOrEqual(a, _: java.lang.Long | _: java.lang.Integer) => isId(a)
      case _ => false
    }
    def num(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
    }
    ours.foreach {
      case EqualTo(_, v)            => lo = math.max(lo, num(v)); hi = math.min(hi, num(v) + 1)
      case GreaterThan(_, v)        => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, num(v))
      case LessThan(_, v)           => hi = math.min(hi, num(v))
      case LessThanOrEqual(_, v)    => hi = math.min(hi, num(v) + 1)
      case _                        => ()
    }
    accepted = ours
    rest
  }
  override def pushedFilters: Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new SeqScan(lo, math.max(lo, hi), parts, required, batchRows)
}

object SeqScan {
  /** Split [lo, hi) into ≤ parts contiguous non-empty ranges. */
  def splitRange(lo: Long, hi: Long, parts: Int): Array[InputPartition] = {
    val total = hi - lo
    if (total <= 0) return Array.empty
    val k = math.max(1, math.min(parts.toLong, total)).toInt
    val step = (total + k - 1) / k
    (0 until k).iterator
      .map(i => SeqRange(lo + i * step, math.min(hi, lo + (i + 1) * step)))
      .filter(r => r.hi > r.lo).map(_.asInstanceOf[InputPartition]).toArray
  }
}

class SeqScan(lo: Long, hi: Long, parts: Int, required: StructType,
              batchRows: Long) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema: StructType = required
  override def toBatch: Batch = this
  /** Post-pushdown size estimate — what lets Catalyst treat a small
    * (or tightly filtered) connector table as broadcastable: without
    * reported statistics a DSv2 relation defaults to "unknown/huge"
    * and can never win a broadcast join. Row width ≈ 8B per long + 8B
    * avg for the word column. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    private val width = 8L * required.fields.length
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * math.max(1L, width))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  override def description: String =
    s"graftseq range [$lo, $hi) cols ${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    SeqScan.splitRange(lo, hi, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames.toIndexedSeq)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SeqMicroBatchStream(lo, hi, parts, required, batchRows)
}

case class SeqRange(lo: Long, hi: Long) extends InputPartition

/** Offset = next unread id; json is just the number, so checkpoint
  * recovery round-trips trivially. */
case class SeqOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = v.toString
}

/** The STREAMING read path of the connector: offsets are plain row
  * positions, each micro-batch plans the [start, end) slice through
  * the same range splitter as the batch scan, and
  * `SupportsAdmissionControl` caps every batch at `batchrows` rows —
  * so an AvailableNow drain replays the table as SEVERAL real
  * micro-batches with offset tracking and commits, not one
  * degenerate snapshot. Filter pushdown and column pruning arrive
  * through the same ScanBuilder as the batch path. */
class SeqMicroBatchStream(lo: Long, hi: Long, parts: Int,
                          required: StructType, batchRows: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}
  // AvailableNow contract: snapshot the end once, then let the
  // engine call the CAPPED latestOffset(start, limit) per batch
  // until it reaches the snapshot — without this trait Spark wraps
  // the stream and drains the snapshot in one uncapped batch
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): SOffset = SeqOffset(lo)
  override def latestOffset(): SOffset = SeqOffset(hi)
  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s0 = start.asInstanceOf[SeqOffset].v
    limit match {
      case r: ReadMaxRows => SeqOffset(math.min(hi, s0 + r.maxRows()))
      case _              => SeqOffset(hi)
    }
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchRows)
  override def deserializeOffset(json: String): SOffset =
    SeqOffset(json.toLong)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] =
    SeqScan.splitRange(start.asInstanceOf[SeqOffset].v,
      end.asInstanceOf[SeqOffset].v, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames.toIndexedSeq)
}

class SeqReaderFactory(cols: IndexedSeq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqRange]
    new PartitionReader[InternalRow] {
      private var cur = r.lo - 1
      override def next(): Boolean = { cur += 1; cur < r.hi }
      override def get(): InternalRow = {
        val vals = cols.map {
          case "id"     => java.lang.Long.valueOf(cur)
          case "bucket" => java.lang.Long.valueOf(SeqSource.bucketOf(cur))
          case "word"   => UTF8String.fromString("w" + (cur % 50))
        }
        new GenericInternalRow(vals.toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}
