package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 table — the Spark-idiomatic analogue of the
  * reference's own storage engine surface (doradb-storage's scan with a
  * pushed-filter slot, `doradb-plan`'s Scan.filt): a deterministic
  * integer-range table (`id`, `sq` = id², `h` = Knuth multiplicative
  * hash of id) that the planner negotiates with instead of just reading:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): range
  *    predicates on `id` (>, >=, <, <=, =) narrow the generated
  *    interval BEFORE any row exists — the scan does less work, not the
  *    filter operator. Non-id / non-range predicates are returned as
  *    residuals for Spark to evaluate (exactly the reference's
  *    "pushed filter slot + residual" split).
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): only
  *    requested columns are materialized per row; `select count(*)`
  *    never computes a hash.
  *  - **Partitioned parallelism**: the interval splits into `slices`
  *    contiguous [[InputPartition]]s, each generated independently on an
  *    executor — embarrassingly parallel at any width, no driver data.
  *
  * Registered under the short name `graft-range` via the usual DSv2
  * lookup (`spark.read.format(classOf[RangeTableProvider].getName)`).
  * The `PlanSpec` pins that pushed bounds appear in the scan description
  * and that pruned schemas reach the reader. */
class RangeTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 reader options are conventionally case-insensitive; the raw
    // properties map is case-preserving, so normalize before lookup or
    // option("End", …) would silently fall back to the default
    val opts = new CaseInsensitiveStringMap(properties)
    val end = Option(opts.get("end")).map(_.toLong).getOrElse(1000L)
    val slices = Option(opts.get("slices")).map(_.toInt).getOrElse(4)
    val batchRows =
      Option(opts.get("batchRows")).map(_.toLong).getOrElse(16384L)
    new RangeTable(end, slices, batchRows)
  }

  override def supportsExternalMetadata(): Boolean = true
}

object RangeSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("h", LongType, nullable = false)))

  /** The Knuth multiplicative hash column, shared with the oracle. */
  def hash(id: Long): Long = (id * 2654435761L) % 4294967296L
}

class RangeTable(end: Long, slices: Int, batchRows: Long = 16384L)
    extends Table with SupportsRead {
  override def name(): String = s"graft_range(0, $end)"
  override def schema(): StructType = RangeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(end, slices, batchRows)
}

class RangeScanBuilder(end: Long, slices: Int, batchRows: Long = 16384L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = end
  // SMA/zone-map interval over `sq` (inclusive): consulted for
  // PARTITION-LEVEL skipping only — the predicate itself stays residual
  private var sqMin = Long.MinValue
  private var sqMax = Long.MaxValue
  private var nZone = 0
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.Schema

  /** Accept only what the source can translate to interval bounds; hand
    * everything else back as a residual. Bounds compose (conjunction ⇒
    * interval intersection). Range predicates on `sq` are remembered as
    * ZONE predicates — the per-partition min/max synopsis analogue of
    * the reference's SMA blocks (doradb-storage/src/col/sma.rs:9-44):
    * a synopsis can only skip whole partitions, never replace row-level
    * filtering, so these return as residuals for Spark to re-apply. `h`
    * carries no synopsis (a multiplicative hash spans the full range in
    * any non-trivial partition), so `h` predicates never skip —
    * exactly how a real SMA degrades on a synopsis-less column. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = ArrayBuffer.empty[Filter]
    val accepted = ArrayBuffer.empty[Filter]
    def zone(f: Filter)(apply: => Unit): Unit = {
      apply; nZone += 1; residual += f
    }
    filters.foreach {
      case f @ GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); accepted += f
      case f @ GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); accepted += f
      case f @ LessThan("id", v: Long) => hi = math.min(hi, v); accepted += f
      case f @ LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); accepted += f
      case f @ EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); accepted += f
      case f @ GreaterThan("sq", v: Long) => zone(f) { sqMin = math.max(sqMin, v + 1) }
      case f @ GreaterThanOrEqual("sq", v: Long) => zone(f) { sqMin = math.max(sqMin, v) }
      case f @ LessThan("sq", v: Long) => zone(f) { sqMax = math.min(sqMax, v - 1) }
      case f @ LessThanOrEqual("sq", v: Long) => zone(f) { sqMax = math.min(sqMax, v) }
      case f @ EqualTo("sq", v: Long) =>
        zone(f) { sqMin = math.max(sqMin, v); sqMax = math.min(sqMax, v) }
      case other => residual += other
    }
    pushed = accepted.toArray
    residual.toArray
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RangeScan(lo, math.max(lo, hi), slices,
    required, pushed.length, batchRows, sqMin, sqMax, nZone)
}

class RangeScan(lo: Long, hi: Long, slices: Int, required: StructType,
    nPushed: Int, batchRows: Long = 16384L,
    sqMin: Long = Long.MinValue, sqMax: Long = Long.MaxValue,
    nZone: Int = 0)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required

  /** The slice grid with its per-partition synopsis consulted: a slice
    * [s, e) has sq ∈ [s², (e-1)²] (monotone over the non-negative id
    * domain), so a slice whose synopsis interval misses the zone
    * predicate interval is skipped at PLANNING time — the reference's
    * SMA block-skip (doradb-storage/src/col/sma.rs:9-44, attr.rs:30-60)
    * done at Spark's partition granularity. */
  private lazy val allSlices: Seq[RangePartition] = {
    val n = math.max(1, slices)
    val span = hi - lo
    (0 until n).map { i =>
      RangePartition(lo + span * i / n, lo + span * (i + 1) / n)
    }
  }
  private lazy val surviving: Seq[RangePartition] =
    allSlices.filter { p =>
      p.start < p.end && {
        val synMin = p.start * p.start
        val synMax = (p.end - 1) * (p.end - 1)
        synMax >= sqMin && synMin <= sqMax
      }
    }

  /** Surfaced in EXPLAIN — the spec greps for the narrowed bounds and
    * the zone-skip count. */
  override def description(): String =
    s"graft-range bounds=[$lo, $hi) pushed=$nPushed zone=$nZone " +
      s"parts=${surviving.length}/${allSlices.length} " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    surviving.map(p => p: InputPartition).toArray

  /** [[SupportsReportStatistics]] — the planner-visible row/byte
    * estimate AFTER pushdown and zone skipping, so CBO and the
    * broadcast-threshold decision see the narrowed scan, not the raw
    * table (the reference reports block counts from the same synopsis
    * store). */
  override def estimateStatistics(): Statistics = {
    val rows = surviving.map(p => p.end - p.start).sum
    val width = 8L * math.max(1, required.length)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong =
        util.OptionalLong.of(rows * width)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)

  /** Streaming face of the same scan: the committed OFFSET is a row
    * position in [lo, hi); each micro-batch covers the next
    * `batchRows` positions (sliced like the batch path), so the source
    * drains in ⌈span/batchRows⌉ batches and a restart resumes from the
    * checkpointed offset — the Kafka-shaped offset contract on a
    * deterministic generator. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, slices, required, batchRows)
}

case class RangeOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class RangeMicroBatchStream(lo: Long, hi: Long, slices: Int,
    required: StructType, batchRows: Long) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  /** AvailableNow contract: the available end is [hi) — already fixed
    * for a bounded generator, so nothing to snapshot. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = RangeOffset(lo)

  /** Unbounded form (no admission control in play): everything. */
  override def latestOffset(): Offset = RangeOffset(hi)

  /** Admission-controlled form — the correct lever for micro-batch
    * sizing: each batch ADMITS at most batchRows rows past the start
    * offset; planInputPartitions then covers exactly the admitted
    * window (truncating there instead would silently drop rows, since
    * the engine commits to the offset IT chose). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    RangeOffset(
      math.min(hi, start.asInstanceOf[RangeOffset].pos + batchRows))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    RangeOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[RangeOffset].pos
    val e0 = end.asInstanceOf[RangeOffset].pos
    val span = e0 - s0
    val n = math.max(1, slices)
    (0 until n).map { i =>
      RangePartition(s0 + span * i / n, s0 + span * (i + 1) / n): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)
}

case class RangePartition(start: Long, end: Long) extends InputPartition

class RangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var cur = rp.start - 1
      // resolve the pruned projection ONCE per partition, not per row
      private val cols: Array[Long => Long] = required.fieldNames.map {
        case "id" => (id: Long) => id
        case "sq" => (id: Long) => id * id
        case "h" => (id: Long) => RangeSource.hash(id)
      }
      override def next(): Boolean = { cur += 1; cur < rp.end }
      override def get(): InternalRow = {
        val vals = new Array[Any](cols.length)
        var i = 0
        while (i < cols.length) { vals(i) = cols(i)(cur); i += 1 }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
