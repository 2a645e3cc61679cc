package graft.sources

import java.util
import java.util.OptionalLong
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * A full DataSource V2 implementation: a deterministic synthetic event
 * generator (`spark.read.format(classOf[SynthSource].getName)`) exercising
 * the connector surfaces a production source needs at 100 TB:
 *
 *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): only the
 *    projected columns are ever generated — the analogue of a columnar
 *    store reading two of forty columns;
 *  - '''filter pushdown into partition planning'''
 *    ([[SupportsPushDownFilters]]): `id` range predicates narrow the
 *    generated key space BEFORE `planInputPartitions`, so pruned splits
 *    are never scheduled — the analogue of partition/file pruning (the
 *    reference's day-partition scans, SURVEY §2.1 S2/F5, give the same
 *    shape via Hive partition filters);
 *  - '''reported statistics''' ([[SupportsReportStatistics]]): post-pushdown
 *    row/byte counts so Catalyst can pick broadcast joins over a narrowed
 *    scan.
 *
 * Row formulas are pure int64 arithmetic on `id` (exact in any engine), so
 * an oracle can replay the generator with `range()` + the same expressions.
 * Generation counters are test-observables (local-mode single JVM) that
 * prove pruning happened — the DSv2 contract, not the data, is what the
 * spec checks.
 */
object SynthSource {
  val Types: Array[String] = Array("click", "view", "purchase", "signup", "error")

  val FullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", LongType, nullable = false)))

  // Formulas stay int64-exact while id * 2654435761 < 2^63, i.e. for
  // sources up to ~3.4e9 rows — beyond that, shard into multiple sources.
  def userId(id: Long): Long = id % 9973L
  def typeIdx(id: Long): Int = ((id * 31L + 7L) % 5L).toInt
  def value(id: Long): Long = (id * 2654435761L) % 1000003L

  /** Rows materialized by readers in this JVM (spec observable; readers
    * accumulate locally and flush on close — no per-row atomics on the
    * generation hot path). */
  val rowsGenerated = new AtomicLong
  /** String cells materialized (spec observable for column pruning). */
  val stringsGenerated = new AtomicLong

  /** DuckDB twin of [[typeIdx]] over an id expression — single source of
    * truth for oracle SQL replaying the generator. */
  def typeSql(id: String): String =
    s"""CASE ($id * 31 + 7) % 5
        WHEN 0 THEN 'click' WHEN 1 THEN 'view' WHEN 2 THEN 'purchase'
        WHEN 3 THEN 'signup' ELSE 'error' END"""

  /** DuckDB twin of [[value]] over an id expression. */
  def valueSql(id: String): String = s"($id * 2654435761) % 1000003"

  /** DuckDB twin of [[userId]] over an id expression. */
  def userIdSql(id: String): String = s"$id % 9973"
}

class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.FullSchema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("parts", "8").toInt,
      properties.getOrDefault("maxRowsPerBatch", "0").toLong)
}

final class SynthTable(rows: Long, parts: Int, batchRows: Long)
    extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.FullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts, batchRows)
}

final class SynthScanBuilder(rows: Long, parts: Int, batchRows: Long) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var schema: StructType = SynthSource.FullSchema
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]

  override def pruneColumns(requiredSchema: StructType): Unit =
    // an empty projection (e.g. COUNT(*)) still reads zero-column rows
    schema = requiredSchema

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int  => Some(i.toLong)
    case _       => None
  }

  /** `id` range predicates narrow [lo, hi); everything else is residual.
    * Accepted filters are honored EXACTLY by the range, so they are not
    * returned as residual — Spark plans no re-filter for them. The +1
    * adjustments saturate instead of wrapping: a Long.MaxValue boundary
    * literal must not overflow into a silently wrong (empty or full)
    * range when no residual filter exists to catch it. */
  private def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filter {
      case GreaterThan("id", v)        if asLong(v).isDefined => lo = math.max(lo, succ(asLong(v).get)); false
      case GreaterThanOrEqual("id", v) if asLong(v).isDefined => lo = math.max(lo, asLong(v).get); false
      case LessThan("id", v)           if asLong(v).isDefined => hi = math.min(hi, asLong(v).get); false
      case LessThanOrEqual("id", v)    if asLong(v).isDefined => hi = math.min(hi, succ(asLong(v).get)); false
      case EqualTo("id", v)            if asLong(v).isDefined =>
        lo = math.max(lo, asLong(v).get); hi = math.min(hi, succ(asLong(v).get)); false
      case _ => true
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SynthScan(schema, math.max(lo, 0L), math.max(hi, lo), rows, parts, batchRows)
}

final case class SynthPartition(start: Long, end: Long) extends InputPartition

final class SynthScan(schema: StructType, lo: Long, hi: Long, rows: Long, parts: Int,
    batchRows: Long = 0L)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  // the post-pushdown [lo, hi) bounds the stream's offset range too —
  // Spark 4.1 doesn't push filters into micro-batch scan builders today,
  // but pushFilters has already claimed id ranges as exactly honored
  // (non-residual), so a future Spark that does push them must not
  // silently read the full range here
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(schema, lo, hi, parts, batchRows)
  override def description(): String = s"SynthScan range=[$lo,$hi) parts=$parts"

  /** Fixed-width splits laid out over the FULL table's key space, then
    * clipped to the post-pushdown range — split width is a table
    * property (like file/partition boundaries), so a narrowed range
    * plans proportionally fewer splits instead of re-dividing itself
    * into `parts` slivers. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (hi <= lo) Array.empty
    else {
      val width = math.max(1L, (rows + parts - 1) / parts)
      val first = lo / width * width
      (first until hi by width)
        .map(s => SynthPartition(math.max(s, lo), math.min(s + width, hi)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(schema)

  /** Post-pushdown stats: 8 bytes per numeric cell, ~8 per string cell. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(1L, (hi - lo) * 8L * math.max(1, schema.length)))
    override def numRows(): OptionalLong = OptionalLong.of(math.max(0L, hi - lo))
  }
}

final case class SynthOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/**
 * Micro-batch side of the connector: offsets are plain row positions
 * (the Kafka-offset shape, SURVEY §2.7 S1/T1), each batch plans the
 * same fixed-width splits over its offset range, and
 * [[SupportsAdmissionControl]] honors `maxRowsPerBatch` the way
 * `maxOffsetsPerTrigger` caps a Kafka drain — bounded batches keep
 * state-store commits and sink files sized at any backlog. Offsets
 * restore exactly from the checkpoint json, so a restarted query
 * resumes mid-range without re-reading.
 *
 * [[SupportsTriggerAvailableNow]] is implemented by the SOURCE (not left
 * to Spark's wrapper): the wrapper drains everything available in one
 * batch, silently bypassing admission control — a native implementation
 * pins the drain target at prepare time AND keeps per-batch caps, which
 * is exactly how the Kafka connector composes AvailableNow with
 * maxOffsetsPerTrigger.
 */
final class SynthMicroBatchStream(schema: StructType, lo: Long, hi: Long, parts: Int, batchRows: Long)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  // the AvailableNow drain target, pinned when the trigger starts; a
  // source that grew after prepare drains only to the pinned target
  @volatile private var target: Long = hi

  override def initialOffset(): Offset = SynthOffset(lo)
  override def deserializeOffset(json: String): Offset = SynthOffset(json.toLong)
  override def latestOffset(): Offset = SynthOffset(hi)
  override def reportLatestOffset(): Offset = SynthOffset(hi)

  override def prepareForTriggerAvailableNow(): Unit = target = hi

  override def getDefaultReadLimit: ReadLimit =
    if (batchRows > 0) ReadLimit.maxRows(batchRows) else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].n
    limit match {
      case m: ReadMaxRows => SynthOffset(math.min(target, s + m.maxRows()))
      case _              => SynthOffset(target)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SynthOffset].n
    val hi = end.asInstanceOf[SynthOffset].n
    if (hi <= lo) Array.empty
    else {
      val width = math.max(1L, (hi - lo + parts - 1) / parts)
      (lo until hi by width)
        .map(s => SynthPartition(s, math.min(s + width, hi)): InputPartition)
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class SynthReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private val types = SynthSource.Types.map(UTF8String.fromString)
      // local counters, flushed once on close — per-row shared atomics
      // would put cross-core contention on the generation hot path of a
      // benchmarked scan
      private var localRows = 0L
      private var localStrings = 0L
      // one generator per projected column — unprojected columns cost nothing
      private val gens: Array[Long => Any] = schema.fields.map(_.name match {
        case "id"      => (id: Long) => id
        case "user_id" => (id: Long) => SynthSource.userId(id)
        case "event_type" => (id: Long) => {
          localStrings += 1
          types(SynthSource.typeIdx(id))
        }
        case "value" => (id: Long) => SynthSource.value(id)
        case other   => throw new IllegalArgumentException(s"unknown column $other")
      })
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        localRows += 1
        new GenericInternalRow(gens.map(g => g(id)))
      }
      override def close(): Unit = {
        SynthSource.rowsGenerated.addAndGet(localRows)
        SynthSource.stringsGenerated.addAndGet(localStrings)
        localRows = 0; localStrings = 0
      }
    }
  }
}
