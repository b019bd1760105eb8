package graft.sources

import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
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
  * consumed, not re-evaluated), partition planning, RUNTIME (dynamic)
  * filtering from join build sides ([[SeqScan.filter]] — the DPP
  * rung), and complete global-aggregate pushdown ([[SeqAggScan]])
  * all reach the scan.
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
    SeqSource.schemaFor(options.getOrDefault("pstep", "0").toLong,
      options.getOrDefault("variant", "false").toBoolean)
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new SeqTable(properties.getOrDefault("n", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt,
      properties.getOrDefault("batchrows", "30000").toLong,
      properties.getOrDefault("pstep", "0").toLong,
      properties.getOrDefault("columnar", "false").toBoolean,
      properties.getOrDefault("noorder", "false").toBoolean,
      properties.getOrDefault("variant", "false").toBoolean,
      properties.getOrDefault("hotsplits", "1").toInt,
      properties.getOrDefault("hotrows", "0").toLong)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("word", StringType, nullable = false)))

  /** With `pstep` > 0 the table is STORAGE-PARTITIONED: it exposes its
    * layout as an extra `pkey = id / pstep` column, one input split per
    * key, reported to Catalyst as a [[KeyGroupedPartitioning]] — the
    * Iceberg-style contract that lets two co-partitioned tables join
    * with NO shuffle on either side (storage-partitioned join). */
  def schemaFor(pstep: Long, variant: Boolean = false): StructType = {
    val base =
      if (pstep > 0) schema.add(StructField("pkey", LongType, nullable = false))
      else schema
    // `variant=true`: an open-format VARIANT column derived from id —
    // the semi-structured twin of the generated scalars
    if (variant) base.add(StructField("props", VariantType, nullable = true))
    else base
  }

  /** md5-60 of "seq"+id, mod 100 — Dedup.md5Hash60's semantics on the
    * JVM side so the SQL twin is the usual ('0x' || substring(md5(…),
    * 1, 15))::BIGINT % 100. */
  def bucketOf(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"seq$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 100L
  }

  /** Test observability (driver-side only; planInputPartitions runs on
    * the driver): partition counts planned by the most recent scan,
    * split by whether a RUNTIME filter had arrived — SourcesSpec pins
    * that a selective join plans strictly fewer partitions. */
  @volatile var lastStaticPlanned: Int = -1
  @volatile var lastRuntimePlanned: Int = -1

  /** The connector's hidden METADATA column: each row's input-split
    * lower id bound. Selectable as `_split_lo` on demand; absent from
    * the table schema, so `SELECT *` and describe never see it — the
    * `_metadata`-for-files contract applied to a generated source
    * (split provenance without widening every scan). */
  val SplitLoColumn: MetadataColumn = new MetadataColumn {
    override def name: String = "_split_lo"
    override def dataType: DataType = LongType
    override def isNullable: Boolean = false
    override def comment: String =
      "lower id bound of the input split that produced this row"
  }
}

class SeqTable(n: Long, parts: Int, batchRows: Long,
               pstep: Long = 0L, columnar: Boolean = false,
               noorder: Boolean = false, variant: Boolean = false,
               hotsplits: Int = 1, hotrows: Long = 0L)
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name: String = s"graftseq(n=$n)"
  override def schema: StructType = SeqSource.schemaFor(pstep, variant)
  override def metadataColumns(): Array[MetadataColumn] =
    Array(SeqSource.SplitLoColumn)
  override def capabilities: java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, parts, batchRows, pstep, columnar, noorder,
      variant, hotsplits, hotrows)
}

/** Folds id-range predicates into [lo, hi) at PLANNING time; every
  * accepted filter is exact (no post-scan re-evaluation), everything
  * else is handed back to Spark. Also accepts GLOBAL aggregate
  * pushdown (COUNT/MIN/MAX/SUM over the surviving range): Spark
  * calls pushAggregation AFTER filters, and only when every filter
  * was consumed exactly, so the folded [lo, hi) is precisely the
  * aggregate's input — the connector answers from range arithmetic
  * (its "footer statistics") and the plan carries NO Aggregate node
  * at all. */
class SeqScanBuilder(n: Long, parts: Int, batchRows: Long = 30000L,
                     pstep: Long = 0L, columnar: Boolean = false,
                     noorder: Boolean = false,
                     private[sources] val variant: Boolean = false,
                     hotsplits: Int = 1,
                     private[sources] val hotrows: Long = 0L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset
    with SupportsPushDownJoin
    with SupportsPushDownTableSample
    with SupportsPushDownVariantExtractions {

  /** VARIANT-extraction pushdown (`SupportsPushDownVariantExtractions`,
    * Spark 4.1): deliberately REFUSES every extraction. Accepting was
    * verified empirically to crash the engine's own rewrite on this
    * (non-parquet) DSv2 path — `V2ScanRelationPushDown.pruneColumns`
    * hits `Invalid call to exprId on unresolved object` via
    * `ScanOperation.getAliasMap` immediately after a successful
    * `pushDownVariants`, even for a single accepted `$.k` extraction
    * on a minimal single-column query; the only upstream implementor
    * (`ParquetScanBuilder`) is exercised through the separate
    * file-source rule (`PushVariantIntoScan`), not this one. Refusal
    * is always safe (the engine keeps `variant_get` exact above the
    * scan — SourcesSpec gates the values), and the interface presence
    * documents the probe contract: extraction paths arrive in
    * `__VARIANT_METADATA_KEY` metadata (`{path, timeZoneId,
    * failOnError}`) with the expected data type, and a refusal round
    * is retried including a whole-variant `$` extraction. */
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    Array.fill(extractions.length)(false)

  /** TABLESAMPLE pushdown — the source applies its own sampling (the
    * JDBC `TABLESAMPLE SYSTEM` shape): for a generated range the
    * deterministic instantiation is the [lower, upper) SLICE of the
    * surviving id span — a legal sample (the contract hands sampling
    * semantics to the store), and deterministic so the oracle can
    * replay it exactly. Pushdown is COMPLETE: the engine drops its
    * Sample operator entirely, and because the fold happens on
    * [lo, hi) it COMPOSES with every later rung — a sampled COUNT
    * still answers closed-form from range arithmetic with no rows
    * read. Replacement sampling is refused (a slice cannot emit
    * duplicates). */
  override def pushTableSample(lowerBound: Double, upperBound: Double,
                               withReplacement: Boolean,
                               seed: Long): Boolean = {
    if (withReplacement || joined) return false
    val span = math.max(0L, hi - lo)
    val newHi = lo + (span * upperBound).toLong
    val newLo = lo + (span * lowerBound).toLong
    lo = newLo
    hi = newHi
    true
  }

  /** JOIN PUSHDOWN (Spark 4.1, `spark.sql.optimizer
    * .datasourceV2JoinPushdown`) — the top rung of the pushdown
    * ladder: the CONNECTOR answers an inner id-equality join of two
    * graftseq tables, so the engine plans ONE scan and no join
    * operator at all. For id-keyed generated ranges the join is
    * closed-form: matching ids are exactly the INTERSECTION of the
    * two (already filter-folded) [lo, hi) ranges, and every output
    * column of either side derives deterministically from id — so
    * the "join" costs what one range scan costs. This is the
    * generated-source analogue of JDBC join pushdown (ship the JOIN
    * to the store): at 100 TB it deletes both scans' shuffle AND the
    * join operator, strictly stronger than SPJ (which still runs the
    * join, just without exchanges). Output columns keep the
    * engine-assigned aliases ([[SupportsPushDownJoin.ColumnWithAlias]]
    * disambiguates name collisions); chained joins compose — a
    * pushed join produces another joinable builder, so an N-way
    * id-equijoin collapses into ONE scan. Anything else (outer
    * joins, non-id keys, compound conditions, already-aggregated
    * sides) is refused and the engine keeps its join — refusal is
    * always safe. */
  private[sources] var outCols: Seq[(String, String, Long)] =
    SeqSource.schemaFor(pstep, variant).fields.toSeq
      .map(f => (f.name, f.name, pstep))
  private var joined = false

  override def isOtherSideCompatibleForJoin(
      other: SupportsPushDownJoin): Boolean =
    other.isInstanceOf[SeqScanBuilder] &&
      pushedAgg.isEmpty && !variant && hotrows <= 0 &&
      other.asInstanceOf[SeqScanBuilder].pushedAgg.isEmpty &&
      !other.asInstanceOf[SeqScanBuilder].variant &&
      other.asInstanceOf[SeqScanBuilder].hotrows <= 0

  override def pushDownJoin(
      other: SupportsPushDownJoin,
      joinType: org.apache.spark.sql.connector.join.JoinType,
      leftCols: Array[SupportsPushDownJoin.ColumnWithAlias],
      rightCols: Array[SupportsPushDownJoin.ColumnWithAlias],
      condition: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Boolean = other match {
    case o: SeqScanBuilder
        if joinType == org.apache.spark.sql.connector.join.JoinType.INNER_JOIN &&
          pushedAgg.isEmpty && o.pushedAgg.isEmpty &&
          // variant sides are refused (also in isOtherSideCompatible):
          // the rebuilt joined schema types every non-word column as
          // LongType, which would corrupt a VARIANT props column.
          // hotrows sides are refused too: the joined scan's reader
          // generates pkey with the factory-default UNIFORM map, which
          // would silently mis-key a skew-mapped side's pkey column
          !variant && !o.variant && hotrows <= 0 && o.hotrows <= 0 =>
      def rename(src: Seq[(String, String, Long)],
                 c: SupportsPushDownJoin.ColumnWithAlias)
          : Option[(String, String, Long)] =
        src.find(_._1.equalsIgnoreCase(c.colName))
          .map { case (_, s, p) =>
            (Option(c.alias).getOrElse(c.colName), s, p) }
      val nl = leftCols.toSeq.map(rename(outCols, _))
      val nr = rightCols.toSeq.map(rename(o.outCols, _))
      if (nl.exists(_.isEmpty) || nr.exists(_.isEmpty)) return false
      val lmap = nl.flatten.map(c => c._1.toLowerCase -> c).toMap
      val rmap = nr.flatten.map(c => c._1.toLowerCase -> c).toMap
      // the condition arrives over the RENAMED namespace; accept
      // exactly `left-id-derived = right-id-derived`
      def refName(e: V2Expression): Option[String] = e match {
        case n: NamedReference if n.fieldNames.length == 1 =>
          Some(n.fieldNames()(0).toLowerCase)
        case _ => None
      }
      val kids = condition.children()
      val keyed = condition.name() == "=" && kids.length == 2 && {
        (refName(kids(0)), refName(kids(1))) match {
          case (Some(a), Some(b)) =>
            (lmap.get(a).exists(_._2 == "id") &&
              rmap.get(b).exists(_._2 == "id")) ||
            (lmap.get(b).exists(_._2 == "id") &&
              rmap.get(a).exists(_._2 == "id"))
          case _ => false
        }
      }
      if (!keyed) return false
      lo = math.max(lo, o.lo)
      hi = math.min(hi, o.hi)
      outCols = nl.flatten ++ nr.flatten
      required = StructType(outCols.map { case (name, src, _) =>
        StructField(name,
          if (src.equalsIgnoreCase("word")) StringType else LongType,
          nullable = false)
      })
      joined = true
      true
    case _ => false
  }
  private var lo = 0L
  private var hi = n
  private var accepted = Array.empty[Filter]
  private var required = SeqSource.schemaFor(pstep, variant)
  private var pushedAgg: Option[Aggregation] = None
  private var topNDesc = false

  /** "Is this (possibly join-renamed) output column id-derived?" —
    * filters/TopN on any alias of id still fold into the range. */
  private def isId(att: String): Boolean =
    outCols.exists(c => c._1.equalsIgnoreCase(att) && c._2 == "id")

  /** LIMIT/TopN/OFFSET fold into the id range too — the pagination
    * rungs of the ladder. The engine calls these AFTER filters, so
    * the folds compose on the surviving [lo, hi). `isPartiallyPushed`
    * stays true (the engine keeps its own Limit/TakeOrdered above —
    * always correct, and partition-concat order never has to carry a
    * global-sort promise); the win is the scan itself, which now
    * PLANS only the limit-sized slice. OFFSET is exact and fully
    * consumed: after an id-DESC TopN the skipped rows are the
    * HIGHEST ids, otherwise the lowest (for a plain un-sorted OFFSET
    * any n rows are a valid skip — the range form is one legal
    * instantiation). All refused once an aggregate is pushed: the
    * agg scan answers from the whole surviving range. */
  override def pushLimit(limit: Int): Boolean = {
    if (pushedAgg.isDefined) false
    else {
      if (topNDesc) lo = math.max(lo, hi - limit)
      else hi = math.min(hi, lo + limit)
      true
    }
  }
  override def isPartiallyPushed(): Boolean = true
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        limit: Int): Boolean = {
    if (pushedAgg.isDefined || orders.length != 1) return false
    orders(0).expression() match {
      case r: NamedReference
          if r.fieldNames.length == 1 && isId(r.fieldNames()(0)) =>
        import org.apache.spark.sql.connector.expressions.SortDirection
        if (orders(0).direction() == SortDirection.DESCENDING) {
          topNDesc = true
          lo = math.max(lo, hi - limit)
        } else hi = math.min(hi, lo + limit)
        true
      case _ => false // sort on a generated column: the engine sorts
    }
  }
  override def pushOffset(offset: Int): Boolean = {
    if (pushedAgg.isDefined) false
    else {
      if (topNDesc) hi = math.max(lo, hi - offset)
      else lo = math.min(hi, lo + offset)
      true
    }
  }

  /** One supported aggregate: COUNT(*) / COUNT(lit) / COUNT(col) on
    * any of the three (all-non-null) columns, MIN/MAX/SUM on id.
    *
    * GROUPED aggregation is claimed as PARTIAL pushdown only
    * (supportCompletePushDown = false): complete pushdown promises
    * one row per group from ONE partition, which would serialize the
    * scan; instead each split emits its own per-group partial rows
    * (answered from modular range arithmetic — the grouped analogue
    * of footer statistics) and the ENGINE plans the final merge
    * aggregate above. What enters the exchange is splits × groups
    * rows, not the table. Grouping is accepted on `word` (50 groups,
    * id % 50 arithmetic) and, in storage-partitioned mode, `pkey`
    * (id / pstep blocks). */
  private def supported(f: AggregateFunc): Boolean = {
    def isCol(e: V2Expression): Boolean = e match {
      case n: NamedReference => n.fieldNames.length == 1 &&
        SeqSource.schema.fieldNames.exists(_.equalsIgnoreCase(n.fieldNames()(0)))
      case _ => false
    }
    def isIdRef(e: V2Expression): Boolean = e match {
      case n: NamedReference =>
        n.fieldNames.length == 1 && isId(n.fieldNames()(0))
      case _ => false
    }
    f match {
      case _: CountStar => true
      case c: Count => !c.isDistinct &&
        (isCol(c.column) || c.column.isInstanceOf[V2Literal[_]])
      case m: Min => isIdRef(m.column)
      case m: Max => isIdRef(m.column)
      case s: Sum => !s.isDistinct && isIdRef(s.column)
      case _ => false
    }
  }

  private def groupColOf(agg: Aggregation): Option[String] =
    agg.groupByExpressions match {
      // pkey grouping is refused on a skew-mapped (hotrows) table:
      // SeqGroupAggScan answers partials from the UNIFORM id/pstep
      // arithmetic, which would silently mis-key the skewed blocks —
      // the engine keeps the aggregate exact instead
      case Array(n: NamedReference) if n.fieldNames.length == 1 &&
          (n.fieldNames()(0).equalsIgnoreCase("word") ||
            (pstep > 0 && hotrows <= 0 &&
              n.fieldNames()(0).equalsIgnoreCase("pkey"))) =>
        Some(n.fieldNames()(0).toLowerCase)
      case _ => None
    }

  private def canPush(agg: Aggregation): Boolean =
    !joined && // a pushed join renames columns; keep aggs engine-side
      (agg.groupByExpressions.isEmpty || groupColOf(agg).isDefined) &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(supported)

  // only the GLOBAL form is complete (no Aggregate node at all);
  // grouped pushdown stays partial so splits aggregate independently
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canPush(agg) && agg.groupByExpressions.isEmpty

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (canPush(agg)) { pushedAgg = Some(agg); true } else false
  }

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
  override def build(): Scan = pushedAgg match {
    case Some(agg) if groupColOf(agg).isDefined =>
      new SeqGroupAggScan(lo, math.max(lo, hi), parts,
        groupColOf(agg).get, agg, pstep)
    case Some(agg) => new SeqAggScan(lo, math.max(lo, hi), agg)
    case None if joined =>
      // joined output: per-column (source, side-pstep) mapping; the
      // scan itself is un-keyed (the join it would have keyed for is
      // already absorbed) and reads rows (the mapping is per-name)
      new SeqScan(lo, math.max(lo, hi), parts, required, batchRows,
        0L, columnar = false, noorder = noorder,
        colMap = outCols.map(c => c._1 -> ((c._2, c._3))).toMap)
    case None => new SeqScan(lo, math.max(lo, hi), parts, required, batchRows,
      pstep, columnar, noorder, hotsplits = hotsplits, hotrows = hotrows)
  }
}

/** Connector-reported CUSTOM METRICS (`CustomMetric` /
  * `CustomTaskMetric`) — the observability rung: the source publishes
  * its own counters into the engine's SQL metrics system, where they
  * aggregate across tasks and surface in the UI/listeners next to the
  * built-ins. This is how a production connector (Iceberg/Delta)
  * reports files-read/skipped without a side channel: at 100 TB,
  * "how much did pruning actually save" must be readable off the
  * query's own metrics, not reconstructed from logs. Task-side:
  * rows each reader generated. Driver-side: splits planned, and
  * splits pruned by the runtime (DPP) filter. */
class RowsGeneratedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name: String = "graft_rows_generated"
  override def description: String = "rows generated by the source"
}
class SplitsPlannedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name: String = "graft_splits_planned"
  override def description: String = "input splits planned"
}
class SplitsPrunedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name: String = "graft_splits_pruned"
  override def description: String = "splits pruned by runtime filtering"
}
private[sources] case class SeqTaskMetric(metricName: String, v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name: String = metricName
  override def value: Long = v
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
              batchRows: Long, pstep: Long = 0L, columnar: Boolean = false,
              noorder: Boolean = false,
              colMap: Map[String, (String, Long)] = Map.empty,
              hotsplits: Int = 1, hotrows: Long = 0L)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering
    with SupportsReportPartitioning with SupportsReportOrdering {
  override def readSchema: StructType = required

  /** Output name → (source column, that column's side pstep). Empty
    * for a plain scan; populated by a pushed join, where engine-
    * assigned aliases (id_1, …) map back to their generators. */
  private def srcOf(name: String): (String, Long) =
    colMap.getOrElse(name, (name, pstep))

  /** Reported OUTPUT ORDERING — the sort-elision rung, the natural
    * companion of [[outputPartitioning]]: every reader streams ids
    * ascending within its split (row and columnar paths alike), and
    * pkey = id/pstep is monotone in id, so [pkey ASC, id ASC] is a
    * truthful per-partition order. The engine folds it into
    * `BatchScanExec.outputOrdering`, so a sort-merge join over two
    * key-grouped graftseq tables plans ZERO sorts on top of SPJ's
    * zero exchanges — the full Iceberg write-ordered-table contract:
    * at 100 TB the SMJ's per-task sort of every fact partition
    * (memory + spill) simply disappears, because the layout already
    * paid it at write time. Only columns the pruned schema retains
    * may appear (the engine resolves these against the scan output).
    * `noorder=true` suppresses the report — the honest rehearsal twin
    * that prices exactly what the declaration saves. */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    if (noorder)
      return Array.empty[org.apache.spark.sql.connector.expressions.SortOrder]
    def asc(c: String) = Expressions.sort(Expressions.column(c),
      SortDirection.ASCENDING)
    if (colMap.nonEmpty)
      // joined output: the engine resolves reported orderings against
      // the ORIGINAL relation's attributes, not the join's aliased
      // output (upstream join pushdown doesn't exercise
      // SupportsReportOrdering), so a joined scan must stay silent —
      // there is no downstream join left to elide sorts for anyway
      return Array.empty[org.apache.spark.sql.connector.expressions.SortOrder]
    val names = required.fieldNames.map(_.toLowerCase)
    val cols =
      (if (pstep > 0 && names.contains("pkey")) Seq("pkey") else Nil) ++
        (if (names.contains("id")) Seq("id") else Nil)
    cols.map(asc).toArray
  }

  /** Storage-partitioned mode (`pstep` > 0): one input split per
    * pkey = id/pstep block, each split carrying its key via
    * [[HasPartitionKey]], and the layout reported as a
    * [[KeyGroupedPartitioning]] over `identity(pkey)`. Under
    * `spark.sql.sources.v2.bucketing.enabled` a join of two tables
    * sharing a `pstep` whose keys cover pkey plans with ZERO
    * exchanges on either side — the storage-partitioned join, the
    * Iceberg/Delta contract for shuffle-free fact⋈fact at 100 TB
    * (co-partition on disk once, never re-shuffle per query).
    * Pushed id-range filters compose: they clip the surviving key
    * blocks, and a side missing whole keys is handled by the
    * engine's partition-value push (empty-partition padding). */
  /** Key-block boundaries as (blockLo, blockHi, key). Uniform map:
    * pkey = id / pstep. SKEWED map (`hotrows` > 0): ids below
    * `hotrows` all land in pkey 0 — ONE genuinely oversized block
    * (the 5%-of-keys-own-half-the-rows fact-table shape) — and the
    * rest are uniform pstep blocks keyed 1 + (id − hotrows) / pstep.
    * Both maps are monotone in id, so the reported [pkey, id]
    * ordering stays truthful. */
  private def keyBlocks: Iterator[(Long, Long, Long)] = {
    if (hotrows <= 0)
      (lo / pstep to (hi - 1) / pstep).iterator.map { k =>
        (math.max(lo, k * pstep), math.min(hi, (k + 1) * pstep), k)
      }
    else {
      val hot =
        if (lo < math.min(hi, hotrows))
          Iterator.single((lo, math.min(hi, hotrows), 0L))
        else Iterator.empty
      val restLo = math.max(lo, hotrows)
      val rest =
        if (hi <= restLo) Iterator.empty
        else ((restLo - hotrows) / pstep to (hi - 1 - hotrows) / pstep)
          .iterator.map { k =>
            (math.max(restLo, hotrows + k * pstep),
              math.min(hi, hotrows + (k + 1) * pstep), k + 1)
          }
      hot ++ rest
    }
  }

  private def bucketSplits: Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    keyBlocks
      .flatMap { case (bLo, bHi, k) =>
        // the SKEWED-LAYOUT twin (`hotsplits` > 1): the pkey=0 block
        // is written as several files, so it plans as several splits
        // CARRYING THE SAME PARTITION KEY — the storage shape of a
        // hot key. Plain SPJ must group them back into one task
        // (the straggler); partially-clustered distribution keeps
        // them apart and replicates the other side's matching block.
        if (k == 0 && hotsplits > 1) {
          val span = bHi - bLo
          val step = math.max(1L, (span + hotsplits - 1) / hotsplits)
          (0 until hotsplits).iterator
            .map(i => SeqBucket(bLo + i * step,
              math.min(bHi, bLo + (i + 1) * step), k))
        } else Iterator.single(SeqBucket(bLo, bHi, k))
      }
      .filter(b => b.hi > b.lo).map(_.asInstanceOf[InputPartition]).toArray
  }

  override def outputPartitioning(): Partitioning =
    if (pstep > 0 && required.fieldNames.exists(_.equalsIgnoreCase("pkey")))
      new KeyGroupedPartitioning(
        Array(Expressions.identity("pkey")), bucketSplits.length)
    else new UnknownPartitioning(SeqScan.splitRange(lo, hi, parts).length)

  override def toBatch: Batch = this

  /** Runtime (dynamic) filtering — the DPP rung of the connector:
    * when this scan is the probe side of a join and the build side is
    * selective, Catalyst injects a DynamicPruningSubquery keyed on
    * `id`; at execution time BatchScanExec collects the build-side
    * keys, hands them here as an IN predicate, and re-plans input
    * partitions — so whole splits are pruned BEFORE any task
    * launches, the generated-source analogue of Iceberg/Delta
    * runtime file pruning. Pruning is partition-granular: surviving
    * splits still emit their full id range (the join above
    * re-filters — a runtime filter is a license to skip, never a
    * duty to apply exactly), and an unrecognized predicate prunes
    * nothing, which is always safe. */
  private var runtimeIds: Option[Array[Long]] = None

  // Storage-partitioned mode opts out of runtime filtering: the
  // KeyGroupedPartitioning contract fixes the split list at planning
  // time (reported numPartitions must equal the planned splits), so
  // runtime split pruning would break it. The two rungs are separate
  // demonstrations by design.
  override def filterAttributes(): Array[NamedReference] =
    // a joined scan stays silent for the same resolution reason as
    // outputOrdering (engine resolves against pre-join attributes)
    if (pstep > 0 || colMap.nonEmpty) Array.empty
    else Array(Expressions.column("id"))

  override def filter(predicates: Array[Predicate]): Unit = {
    def isIdRef(e: V2Expression): Boolean = e match {
      case n: NamedReference =>
        n.fieldNames.length == 1 &&
          srcOf(n.fieldNames()(0))._1.equalsIgnoreCase("id")
      case _ => false
    }
    def longOf(e: V2Expression): Option[Long] = e match {
      case l: V2Literal[_] => l.value match {
        case v: java.lang.Long    => Some(v.longValue)
        case v: java.lang.Integer => Some(v.longValue)
        case v: java.lang.Short   => Some(v.longValue)
        case _ => None
      }
      case _ => None
    }
    predicates.foreach { p =>
      val kids = p.children()
      val vals: Option[Array[Long]] = p.name() match {
        case "IN" if kids.nonEmpty && isIdRef(kids(0)) =>
          val vs = kids.drop(1).map(longOf)
          if (vs.nonEmpty && vs.forall(_.isDefined)) Some(vs.map(_.get))
          else None
        case "=" if kids.length == 2 && isIdRef(kids(0)) =>
          longOf(kids(1)).map(Array(_))
        case "=" if kids.length == 2 && isIdRef(kids(1)) =>
          longOf(kids(0)).map(Array(_))
        case _ => None // unknown shape: prune nothing (safe)
      }
      vals.foreach { ids =>
        val sorted = ids.sorted
        runtimeIds = Some(runtimeIds match {
          case Some(prev) => // conjunction of arriving filters
            val set = sorted.toSet
            prev.filter(set.contains)
          case None => sorted
        })
      }
    }
  }
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
  // driver-side metric state, filled by the LAST planInputPartitions
  // (reportDriverMetrics is called after planning by contract)
  @volatile private var plannedSplits = 0
  @volatile private var prunedSplits = 0

  override def planInputPartitions(): Array[InputPartition] = {
    if (pstep > 0) {
      val b = bucketSplits
      plannedSplits = b.length
      return b
    }
    val base = SeqScan.splitRange(lo, hi, parts)
    val res = runtimeIds match {
      case Some(ids) => // sorted: binary-search each split for a survivor
        base.filter { p =>
          val r = p.asInstanceOf[SeqRange]
          val i = java.util.Arrays.binarySearch(ids, r.lo)
          val at = if (i >= 0) i else -i - 1
          at < ids.length && ids(at) < r.hi
        }
      case None => base
    }
    if (runtimeIds.isDefined) SeqSource.lastRuntimePlanned = res.length
    else SeqSource.lastStaticPlanned = res.length
    plannedSplits = res.length
    prunedSplits = base.length - res.length
    res
  }

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new RowsGeneratedMetric, new SplitsPlannedMetric,
      new SplitsPrunedMetric)

  override def reportDriverMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(SeqTaskMetric("graft_splits_planned", plannedSplits),
      SeqTaskMetric("graft_splits_pruned", prunedSplits))

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required.fieldNames.map(srcOf).toIndexedSeq,
      columnar, hotrows)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    // cols via srcOf — a streamed pstep table's pkey column must
    // carry the REAL pstep (and the skew map), not a rebuilt
    // (name, 0) pair that would divide by zero at read time
    new SeqMicroBatchStream(lo, hi, parts,
      required.fieldNames.map(srcOf).toIndexedSeq, batchRows, hotrows)
}

/** An id range a reader streams — the split currency of every scan. */
sealed trait SeqSplit extends InputPartition {
  def lo: Long; def hi: Long
}

case class SeqRange(lo: Long, hi: Long) extends SeqSplit

/** A storage-partition split: the [lo, hi) block of pkey `key`,
  * carrying the key for the engine's key-grouped split bookkeeping
  * (sort, group, pad missing values on the other join side). */
case class SeqBucket(lo: Long, hi: Long, key: Long)
    extends SeqSplit with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](key))
}

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
                          cols: IndexedSeq[(String, Long)], batchRows: Long,
                          hotrows: Long = 0L)
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
    new SeqReaderFactory(cols, hotrows = hotrows)
}

/** The scan a pushed GLOBAL aggregate builds to: one partition, one
  * row, each value answered from range arithmetic over the
  * post-filter [lo, hi) — count = hi−lo, min/max are the bounds,
  * sum(id) is the closed-form series (the connector equivalent of
  * answering COUNT from parquet footers without touching data
  * pages). EXACTLY ONE partition by contract: complete pushdown
  * removes the Aggregate node entirely, so a second partition would
  * literally duplicate the result row. Empty range → SQL semantics:
  * count 0, null min/max/sum. */
class SeqAggScan(lo: Long, hi: Long, agg: Aggregation)
    extends Scan with Batch {
  private val funcs: IndexedSeq[AggregateFunc] =
    agg.aggregateExpressions.toIndexedSeq
  override def readSchema: StructType =
    StructType(funcs.zipWithIndex.map { case (f, i) =>
      StructField(s"agg_$i", LongType, nullable = !f.isInstanceOf[Count] &&
        !f.isInstanceOf[CountStar])
    })
  override def toBatch: Batch = this
  override def description: String =
    s"graftseq range [$lo, $hi) pushed aggregates " +
      funcs.map(_.toString).mkString("[", ", ", "]")
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqRange(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqAggReaderFactory(funcs)
}

class SeqAggReaderFactory(funcs: IndexedSeq[AggregateFunc])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqSplit]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val f = !emitted; emitted = true; f }
      override def get(): InternalRow = {
        val n = math.max(0L, r.hi - r.lo)
        def nullable(v: => Long): Any =
          if (n == 0) null else java.lang.Long.valueOf(v)
        val vals: IndexedSeq[Any] = funcs.map {
          case _: CountStar => java.lang.Long.valueOf(n)
          case _: Count     => java.lang.Long.valueOf(n) // non-null cols
          case _: Min       => nullable(r.lo)
          case _: Max       => nullable(r.hi - 1)
          // arithmetic series; BigInt guards the (lo+hi)·n product
          // even though callers stay far from Long range today
          case _: Sum =>
            if (n == 0) null
            else java.lang.Long.valueOf(
              ((BigInt(r.lo) + BigInt(r.hi - 1)) * BigInt(n) / 2).toLong)
          case f => throw new IllegalStateException(s"unsupported agg $f")
        }
        new GenericInternalRow(vals.toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}

/** The scan a pushed GROUPED aggregate builds to — PARTIAL pushdown:
  * the id range still splits into `parts` independent input
  * partitions, and each split emits ONE row per group it intersects,
  * carrying that split's partial COUNT/MIN/MAX/SUM for the group.
  * The engine's final Aggregate above merges the partials (Spark
  * rewrites COUNT→sum-of-partials etc.), so the exchange carries
  * splits × groups rows instead of the table. Partials are answered
  * CLOSED-FORM: word = "w"+id%50 makes each group an arithmetic
  * progression within the split range, and pkey = id/pstep a
  * contiguous block — no row is ever materialized (the grouped
  * analogue of answering from footer statistics). Output schema by
  * the partial-pushdown contract: group column first, then one
  * column per aggregate, positionally matched. */
class SeqGroupAggScan(lo: Long, hi: Long, parts: Int, groupCol: String,
                      agg: Aggregation, pstep: Long)
    extends Scan with Batch {
  private val funcs: IndexedSeq[AggregateFunc] =
    agg.aggregateExpressions.toIndexedSeq
  override def readSchema: StructType =
    StructType(
      StructField(groupCol,
        if (groupCol == "word") StringType else LongType,
        nullable = false) +:
      funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      })
  override def toBatch: Batch = this
  override def description: String =
    s"graftseq range [$lo, $hi) pushed GROUP BY $groupCol partial aggregates " +
      funcs.map(_.toString).mkString("[", ", ", "]")
  override def planInputPartitions(): Array[InputPartition] =
    SeqScan.splitRange(lo, hi, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqGroupAggReaderFactory(groupCol, funcs, pstep)
}

class SeqGroupAggReaderFactory(groupCol: String,
                               funcs: IndexedSeq[AggregateFunc],
                               pstep: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqSplit]
    // (group key, count, min id, max id) per group in [r.lo, r.hi)
    val groups: IndexedSeq[(Any, Long, Long, Long)] = groupCol match {
      case "word" =>
        (0 until 50).flatMap { j =>
          // first id >= lo with id % 50 == j
          val f = r.lo + (((j - r.lo) % 50 + 50) % 50)
          if (f >= r.hi) None
          else {
            val last = f + 50L * ((r.hi - 1 - f) / 50)
            Some((UTF8String.fromString("w" + j): Any,
              (last - f) / 50 + 1, f, last))
          }
        }
      case "pkey" =>
        (r.lo / pstep to (r.hi - 1) / pstep).iterator.map { k =>
          val mn = math.max(r.lo, k * pstep)
          val mx = math.min(r.hi, (k + 1) * pstep) - 1
          (java.lang.Long.valueOf(k): Any, mx - mn + 1, mn, mx)
        }.filter(_._2 > 0).toIndexedSeq
    }
    val rows: IndexedSeq[InternalRow] = groups.map {
      case (key, cnt, mn, mx) =>
        val vals: IndexedSeq[Any] = funcs.map {
          case _: CountStar | _: Count => java.lang.Long.valueOf(cnt)
          case _: Min => java.lang.Long.valueOf(mn)
          case _: Max => java.lang.Long.valueOf(mx)
          // arithmetic progression: count * (first + last) / 2
          case _: Sum => java.lang.Long.valueOf(
            ((BigInt(mn) + BigInt(mx)) * BigInt(cnt) / 2).toLong)
          case f => throw new IllegalStateException(s"unsupported agg $f")
        }
        new GenericInternalRow((key +: vals).toArray[Any])
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

object SeqReaderFactory {
  /** The VARIANT column's per-row value: open-format binary variant
    * built from the id-derived JSON — deterministic, so the DuckDB
    * oracle replays the same fields from arithmetic. */
  def propsOf(id: Long): org.apache.spark.unsafe.types.VariantVal = {
    val v = org.apache.spark.types.variant.VariantBuilder.parseJson(
      s"""{"k":${id % 100},"tag":"t${id % 5}"}""", false)
    new org.apache.spark.unsafe.types.VariantVal(v.getValue, v.getMetadata)
  }
}

/** Per-column (source, pstep) pairs: a plain scan's columns carry the
  * scan's own pstep; a pushed-join scan maps each aliased output back
  * to its source column and ORIGINAL side's pstep. */
class SeqReaderFactory(cols: IndexedSeq[(String, Long)],
                       columnar: Boolean = false, hotrows: Long = 0L)
    extends PartitionReaderFactory {
  /** The pkey map, skew-aware (see SeqScan.keyBlocks). */
  private def pkeyOf(id: Long, p: Long): Long =
    if (hotrows <= 0) id / p
    else if (id < hotrows) 0L
    else 1L + (id - hotrows) / p
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqSplit]
    new PartitionReader[InternalRow] {
      private var cur = r.lo - 1
      override def next(): Boolean = { cur += 1; cur < r.hi }
      override def get(): InternalRow = {
        val vals = cols.map {
          case ("id", _)     => java.lang.Long.valueOf(cur)
          case ("bucket", _) => java.lang.Long.valueOf(SeqSource.bucketOf(cur))
          case ("word", _)   => UTF8String.fromString("w" + (cur % 50))
          case ("pkey", p)   => java.lang.Long.valueOf(pkeyOf(cur, p))
          case ("props", _)  => SeqReaderFactory.propsOf(cur)
          case ("_split_lo", _) => java.lang.Long.valueOf(r.lo)
        }
        new GenericInternalRow(vals.toArray[Any])
      }
      override def currentMetricsValues()
          : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(SeqTaskMetric("graft_rows_generated",
          math.max(0L, math.min(cur + 1, r.hi) - r.lo)))
      override def close(): Unit = ()
    }
  }

  /** The VECTORIZED read path (`columnar=true`): rows materialize
    * straight into on-heap column vectors, 4096 per [[ColumnarBatch]],
    * and the engine consumes them through its columnar protocol
    * (`ColumnarToRow` above the scan, itself codegen'd) — the
    * parquet-vectorized-reader shape for a custom source. Same values
    * as the row path; SourcesSpec pins equality and the columnar plan.
    * A pruned schema that retains the VARIANT `props` column falls
    * back to the ROW path (no variant column vector exists in the
    * on-heap vector set) — `columnar=true, variant=true` stays
    * correct instead of hitting an unmatched column at scan time. */
  override def supportColumnarReads(p: InputPartition): Boolean =
    columnar && !cols.exists(_._1 == "props")

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val r = p.asInstanceOf[SeqSplit]
    new PartitionReader[ColumnarBatch] {
      private val cap = 4096
      private var cur = r.lo
      private val vectors = cols.map { c =>
        new OnHeapColumnVector(cap,
          if (c._1 == "word") StringType else LongType)
      }.toArray
      private val batch =
        new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector])
      override def next(): Boolean = {
        if (cur >= r.hi) return false
        val n = math.min(cap.toLong, r.hi - cur).toInt
        vectors.foreach(_.reset())
        var ci = 0
        while (ci < cols.length) {
          val v = vectors(ci)
          var i = 0
          cols(ci) match {
            case ("id", _) =>
              while (i < n) { v.putLong(i, cur + i); i += 1 }
            case ("bucket", _) =>
              while (i < n) { v.putLong(i, SeqSource.bucketOf(cur + i)); i += 1 }
            case ("word", _) =>
              while (i < n) {
                v.putByteArray(i, ("w" + ((cur + i) % 50)).getBytes("UTF-8"))
                i += 1
              }
            case ("pkey", p) =>
              while (i < n) { v.putLong(i, pkeyOf(cur + i, p)); i += 1 }
            case ("_split_lo", _) =>
              while (i < n) { v.putLong(i, r.lo); i += 1 }
          }
          ci += 1
        }
        cur += n
        batch.setNumRows(n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def currentMetricsValues()
          : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(SeqTaskMetric("graft_rows_generated",
          math.max(0L, math.min(cur, r.hi) - r.lo)))
      override def close(): Unit = batch.close()
    }
  }
}
