package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => V2Literal, NamedReference, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportStatistics, SupportsRuntimeV2Filtering}
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
    StructField("h", LongType, nullable = false),
    StructField("seg", LongType, nullable = false),
    StructField("par", org.apache.spark.sql.types.BooleanType,
      nullable = false)))

  /** The packed-bool column: id parity. A per-row-alternating flag is
    * the worst case for RLE and the natural case for a BITMAP codec —
    * the third member of the reference's codec enum
    * (doradb-storage/src/col/codec/mod.rs:9-33, Codec::Bitmap). */
  def par(id: Long): Boolean = (id & 1L) == 0L

  /** The Knuth multiplicative hash column, shared with the oracle. */
  def hash(id: Long): Long = (id * 2654435761L) % 4294967296L

  /** The long-typed generated-column formulas — the SINGLE source of
    * truth shared by the row reader, the columnar fills, and the PSMA
    * builder. Three consumers spell these semantics; divergence
    * between the PSMA index function and the emitted rows would
    * silently break the [first, last) containment guarantee (rows
    * dropped, not an error), so they must all read from here. `par`
    * is boolean and lives in [[par]]. */
  val LongGen: Map[String, Long => Long] = Map(
    "id" -> identity[Long] _,
    "sq" -> ((id: Long) => id * id),
    "h" -> (hash _),
    "seg" -> ((id: Long) => id / SegRows))

  /** Rows per storage segment: `seg` = id div [[SegRows]] is the
    * segment-id attribute — constant over any segment-aligned batch,
    * the shape real columnar stores carry for block-level metadata
    * columns (tenant / date / shard of a sorted block). */
  val SegRows: Long = 16384L

  /** Count of columnar batches whose `seg` column was served as a
    * CONSTANT vector (the Data-Blocks `Codec::Single` / RLE-1 mirror:
    * one value decoded for the whole vector instead of n fills).
    * Local-mode observability hook for the spec, like
    * [[lastRuntimeBounds]]. */
  val constantSegBatches = new java.util.concurrent.atomic.LongAdder

  /** Largest id whose square is exact in int64 (⌊√Long.MaxValue⌋):
    * beyond it the generated `sq` column wraps, so sq-based zone maps
    * and closed-form aggregates are disabled. */
  val SqExactMaxId: Long = 3037000499L

  /** Last runtime-filter narrowing applied to any RangeScan
    * ((lo, hi) after the IN-set intersection) — observability hook for
    * the spec; runtime filtering happens driver-side at execution, so
    * a static is the honest way to witness it. */
  @volatile var lastRuntimeBounds: Option[(Long, Long)] = None

  /** Rows skipped by PSMA positional sub-ranges (reader-side witness,
    * like [[constantSegBatches]]): partition rows minus the probed
    * sub-range's rows, summed over partitions. */
  val psmaSkippedRows = new java.util.concurrent.atomic.LongAdder

  /** Count of columnar batches whose `par` column was served through
    * the packed-bitmap vector (witness, like [[constantSegBatches]]). */
  val bitmapParBatches = new java.util.concurrent.atomic.LongAdder
}

/** Bitmap-backed boolean vector — the `Codec::Bitmap` mirror
  * (doradb-storage/src/col/codec/mod.rs:29-30, col/bitmap.rs): the
  * column exists only as packed bits (one long word per 64 rows, 8×
  * denser than Spark's byte-per-bool OnHeapColumnVector), and reads
  * are single bit tests — byte-addressable without decompression,
  * the Data-Blocks property the reference's codec design cites. The
  * column is non-nullable by construction, so the null face is
  * constant. */
final class BitmapColumnVector(capacity: Int)
    extends org.apache.spark.sql.vectorized.ColumnVector(
      org.apache.spark.sql.types.BooleanType) {
  private val words = new Array[Long]((capacity + 63) >> 6)

  def clear(): Unit = java.util.Arrays.fill(words, 0L)

  def setBit(i: Int, v: Boolean): Unit =
    if (v) words(i >> 6) |= 1L << (i & 63)

  override def getBoolean(i: Int): Boolean =
    ((words(i >> 6) >>> (i & 63)) & 1L) == 1L

  override def hasNull: Boolean = false
  override def numNulls: Int = 0
  override def isNullAt(i: Int): Boolean = false
  override def close(): Unit = ()

  private def unsupported: Nothing =
    throw new UnsupportedOperationException("bitmap vector is boolean-only")
  override def getByte(i: Int): Byte = unsupported
  override def getShort(i: Int): Short = unsupported
  override def getInt(i: Int): Int = unsupported
  override def getLong(i: Int): Long = unsupported
  override def getFloat(i: Int): Float = unsupported
  override def getDouble(i: Int): Double = unsupported
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    unsupported
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    unsupported
  override def getDecimal(i: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal = unsupported
  override def getUTF8String(i: Int)
      : org.apache.spark.unsafe.types.UTF8String = unsupported
  override def getBinary(i: Int): Array[Byte] = unsupported
  override def getChild(i: Int)
      : org.apache.spark.sql.vectorized.ColumnVector = unsupported
}

/** Positional SMA over one partition's hash column — the intra-block
  * POSITION lookup the reference layers on its min/max synopsis
  * (doradb-storage/src/col/sma.rs:255-345, repr.rs:134-160): a table
  * indexed by the LEADING NON-ZERO BYTE of (value − min) — slot =
  * byte index × 256 + byte value — whose slots hold the [first, last)
  * row sub-range of the partition containing any value of that byte
  * bucket. An equality probe then reads only the sub-range instead of
  * the whole partition: the zone map can never skip on a hash column
  * (its min/max spans the domain in any non-trivial block), but the
  * position table still bounds WHERE inside the block the matches can
  * sit. Build is two arithmetic passes at partition open — the
  * analogue of building the synopsis at block-write time (a real
  * store persists it alongside the block; this generated source has
  * no write side, so open-time build is the honest equivalent and
  * costs two multiply-loops, no row materialization). `h` deltas fit
  * u32 (the hash is mod 2³²), so the table is the reference's 4-byte
  * 1024-slot shape. */
final class Psma(start: Long, end: Long, valueOf: Long => Long) {
  private var minV: Long = Long.MaxValue
  private var maxV: Long = Long.MinValue
  // slot ranges as row OFFSETS within the partition; last = 0 = empty
  // (the reference's (0u16, 0u16) empty encoding — offset 0 can never
  // be a live `last`, which is always first+1 or more). 8×256 slots:
  // the general 8-byte-delta table (sma.rs build_lookup8 / Entry2048)
  // serves any int64 column; a write side with domain statistics would
  // narrow to the 1/2/4-byte kinds like the reference does.
  private val first: Array[Long] = new Array[Long](8 * 256)
  private val last: Array[Long] = new Array[Long](8 * 256)

  locally { // pass 1: block min/max
    var id = start
    while (id < end) {
      val v = valueOf(id)
      if (v < minV) minV = v
      if (v > maxV) maxV = v
      id += 1
    }
  }
  locally { // pass 2: fill [first, last) per leading-byte slot
    var id = start
    while (id < end) {
      val s = slot(valueOf(id) - minV)
      val off = id - start
      if (last(s) == 0L) { first(s) = off; last(s) = off + 1 }
      else last(s) = off + 1
      id += 1
    }
  }

  /** Leading non-zero byte of a u64 delta, big-endian byte order
    * (repr.rs:141-155: all-zero deltas land in the last byte's zero
    * slot). */
  private def slot(delta: Long): Int = {
    var idx = 0
    var shift = 56
    while (shift > 0 && ((delta >>> shift) & 0xFFL) == 0L) {
      idx += 1; shift -= 8
    }
    idx * 256 + ((delta >>> shift) & 0xFFL).toInt
  }

  /** Absolute [start, end) id sub-range that can contain `v`; empty
    * when the synopsis proves absence (out of min/max, or the byte
    * bucket never occurred). */
  def probe(v: Long): (Long, Long) = {
    if (v < minV || v > maxV) return (start, start)
    val s = slot(v - minV)
    if (last(s) == 0L) (start, start)
    else (start + first(s), start + last(s))
  }
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {
  private var lo = 0L
  private var hi = end
  // SMA/zone-map interval over `sq` (inclusive): consulted for
  // PARTITION-LEVEL skipping only — the predicate itself stays residual
  private var sqMin = Long.MinValue
  private var sqMax = Long.MaxValue
  private var nZone = 0
  private var nResidual = 0
  // PSMA probes: equality values on `h`/`sq` remembered for
  // reader-side positional sub-range skipping (the predicates stay
  // residual / zone-tracked)
  private var psmaProbes: List[(String, Long)] = Nil
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
    val Seg = RangeSource.SegRows
    def segSafe(v: Long): Boolean =
      v > Long.MinValue / Seg && v < Long.MaxValue / Seg - 1
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
      // seg = id div SegRows is EXACT over the non-negative generated
      // domain, so segment predicates translate to id bounds and are
      // fully accepted (segment elimination — the reference prunes
      // whole blocks from the same block-id arithmetic). Values big
      // enough to overflow the multiply stay residual.
      case f @ EqualTo("seg", v: Long) if segSafe(v) =>
        lo = math.max(lo, v * Seg); hi = math.min(hi, (v + 1) * Seg)
        accepted += f
      case f @ GreaterThan("seg", v: Long) if segSafe(v) =>
        lo = math.max(lo, (v + 1) * Seg); accepted += f
      case f @ GreaterThanOrEqual("seg", v: Long) if segSafe(v) =>
        lo = math.max(lo, v * Seg); accepted += f
      case f @ LessThan("seg", v: Long) if segSafe(v) =>
        hi = math.min(hi, v * Seg); accepted += f
      case f @ LessThanOrEqual("seg", v: Long) if segSafe(v) =>
        hi = math.min(hi, (v + 1) * Seg); accepted += f
      case f @ GreaterThan("sq", v: Long) => zone(f) { sqMin = math.max(sqMin, v + 1) }
      case f @ GreaterThanOrEqual("sq", v: Long) => zone(f) { sqMin = math.max(sqMin, v) }
      case f @ LessThan("sq", v: Long) => zone(f) { sqMax = math.min(sqMax, v - 1) }
      case f @ LessThanOrEqual("sq", v: Long) => zone(f) { sqMax = math.min(sqMax, v) }
      case f @ EqualTo("sq", v: Long) =>
        // zone interval (partition-level skip) AND a PSMA probe: in
        // the one partition the zone map cannot eliminate, the
        // position table narrows to the value's leading-byte run —
        // on this monotone column, ~1/256th of the block
        zone(f) { sqMin = math.max(sqMin, v); sqMax = math.min(sqMax, v) }
        psmaProbes ::= ("sq", v)
      // `h` equality: no zone map can skip on a hash column, and on a
      // uniformly-hashed block the PSMA sub-range honestly degrades
      // toward the whole block (equal-bucket values scatter end to
      // end) — but min/max still proves absence and edge runs still
      // trim; remember the probe, keep the predicate residual
      // (synopses narrow, never replace filtering)
      case f @ EqualTo("h", v: Long) =>
        psmaProbes ::= ("h", v); residual += f
      case other => nResidual += 1; residual += other
    }
    pushed = accepted.toArray
    residual.toArray
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** True when every filter became an interval bound — residuals (zone
    * or otherwise) mean Spark still filters rows after the scan, so
    * aggregate/limit pushdown would answer over the WRONG row set. */
  private def noResiduals: Boolean =
    nZone == 0 && nResidual == 0 && psmaProbes.isEmpty

  // ---- aggregate pushdown (SMA-answered, like the reference's
  // synopsis lookups — doradb-storage/src/col/sma.rs): over the
  // generated interval every supported aggregate has a closed form, so
  // a pushed COUNT/MIN/MAX/SUM never materializes a row ------------------

  /** Closed-form value for one aggregate over [lo, hi), or None when
    * the function is outside the supported set. */
  private def closedForm(f: AggregateFunc): Option[(StructField, Any)] = {
    val span = math.max(0L, hi - lo)
    def field(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    def empty = span == 0L
    f match {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false), span))
      // sq forms only inside the int64-exact square domain — beyond
      // RangeSource.SqExactMaxId the generated column wraps and the
      // closed form would answer the unwrapped mathematical value
      case m: Min => field(m.column).collect {
        case "id" => (StructField("min_id", LongType), if (empty) null else lo)
        case "sq" if hi - 1 <= RangeSource.SqExactMaxId =>
          (StructField("min_sq", LongType), if (empty) null else lo * lo)
      }
      case m: Max => field(m.column).collect {
        case "id" =>
          (StructField("max_id", LongType), if (empty) null else hi - 1)
        case "sq" if hi - 1 <= RangeSource.SqExactMaxId =>
          (StructField("max_sq", LongType),
            if (empty) null else (hi - 1) * (hi - 1))
      }
      case s: Sum if !s.isDistinct => field(s.column).collect {
        // Σ[lo,hi) = (lo + hi - 1)·span / 2 — only pushed while the
        // true sum fits int64 (checked in BigInt at plan time);
        // otherwise the scan falls back and Spark's own aggregation
        // applies its usual overflow semantics
        case "id" if empty ||
            ((BigInt(lo) + BigInt(hi - 1)) * BigInt(span) / 2).isValidLong =>
          val v = if ((span & 1L) == 0L) (span / 2) * (lo + hi - 1)
            else span * ((lo + hi - 1) / 2)
          (StructField("sum_id", LongType), if (empty) null else v)
      }
      case _ => None
    }
  }

  private def translate(agg: Aggregation)
      : Option[Seq[(StructField, Any)]] = {
    if (!noResiduals || agg.groupByExpressions.nonEmpty) return None
    val forms = agg.aggregateExpressions.map(closedForm)
    if (forms.forall(_.isDefined)) Some(forms.toSeq.map(_.get)) else None
  }

  private var aggResult: Option[Seq[(StructField, Any)]] = None

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case some @ Some(_) => aggResult = some; true
      case None => false
    }

  // ---- limit / top-N pushdown: the generated interval is ordered by
  // id, so LIMIT n (and ORDER BY id ASC LIMIT n) truncate hi ------------

  private var limited = false

  override def pushLimit(limit: Int): Boolean = {
    if (!noResiduals) return false
    hi = math.min(hi, lo + limit.toLong)
    limited = true
    true
  }

  override def isPartiallyPushed(): Boolean = false

  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean = {
    // only the source's NATIVE order (id ASC) can be answered by
    // truncation; any other order needs Spark's sort
    val nativeOrder = orders.length == 1 && {
      val o = orders(0)
      (o.expression match {
        case nr: NamedReference =>
          nr.fieldNames.length == 1 && nr.fieldNames()(0) == "id"
        case _ => false
      }) &&
        o.direction == org.apache.spark.sql.connector.expressions
          .SortDirection.ASCENDING
    }
    if (nativeOrder) pushLimit(limit) else false
  }

  override def build(): Scan = aggResult match {
    case Some(forms) =>
      new RangeAggScan(
        StructType(forms.map(_._1)), forms.map(_._2).toArray,
        s"graft-range agg-pushdown bounds=[$lo, $hi) " +
          s"funcs=${forms.map(_._1.name).mkString(",")}")
    case None =>
      new RangeScan(lo, math.max(lo, hi), slices,
        required, pushed.length, batchRows, sqMin, sqMax, nZone, limited,
        psmaProbes)
  }
}

/** The pushed-aggregate scan: one partition, one row, zero generated
  * data — the aggregate was answered from the interval's closed forms
  * at plan time. */
class RangeAggScan(schema: StructType, row: Array[Any], desc: String)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def description(): String = desc
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(RangeAggPartition(row))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean =
            if (emitted) false else { emitted = true; true }
          override def get(): InternalRow =
            new GenericInternalRow(
              p.asInstanceOf[RangeAggPartition].values.clone())
          override def close(): Unit = ()
        }
    }
}

case class RangeAggPartition(values: Array[Any]) extends InputPartition

class RangeScan(lo: Long, hi: Long, slices: Int, required: StructType,
    nPushed: Int, batchRows: Long = 16384L,
    sqMin: Long = Long.MinValue, sqMax: Long = Long.MaxValue,
    nZone: Int = 0, limited: Boolean = false,
    psmaProbes: Seq[(String, Long)] = Nil)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  /** Runtime-narrowed bounds: start at the compile-time interval and
    * tighten when [[filter]] delivers join-key values at execution
    * (dynamic partition pruning over DSv2). defs below — NOT lazy
    * vals — so partition planning sees the post-filter interval even
    * though EXPLAIN/statistics already forced an earlier evaluation. */
  private var rlo = lo
  private var rhi = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  /** Dynamic pruning at execution: the runtime predicate arrives as
    * `id IN (v…)` built from the selective join side's actual keys;
    * the generated interval intersects with the value span, so the
    * re-planned slices skip everything outside it — the DSv2 analogue
    * of partition-pruned file sources under DPP (and of the
    * reference's synopsis-guided block skips, consulted at run time
    * like its PSMA lookups, doradb-storage/src/col/attr.rs:30-60). */
  override def filter(predicates: Array[Predicate]): Unit = {
    // A limit-pushed scan already promised Spark an eliminated LIMIT by
    // truncating hi; narrowing [rlo, rhi) afterwards could return fewer
    // rows than that promise. The combination is unreachable today
    // (limit pushes only directly above the scan, runtime filters only
    // arrive under joins) but nothing structural forbids it — so refuse
    // runtime narrowing outright on a limited scan rather than rely on
    // planner coincidence.
    if (limited) return
    predicates.foreach { p =>
      if (p.name() == "IN") {
        val vals = p.children().toSeq.collect {
          case l: V2Literal[_] => l.value() match {
            case v: java.lang.Long => v.longValue()
            case v: java.lang.Integer => v.intValue().toLong
          }
        }
        if (vals.nonEmpty) {
          rlo = math.max(rlo, vals.min)
          rhi = math.min(rhi, vals.max + 1)
          RangeSource.lastRuntimeBounds = Some((rlo, rhi))
        }
      }
    }
  }

  override def readSchema(): StructType = required

  /** The slice grid with its per-partition synopsis consulted: a slice
    * [s, e) has sq ∈ [s², (e-1)²] (monotone over the non-negative id
    * domain), so a slice whose synopsis interval misses the zone
    * predicate interval is skipped at PLANNING time — the reference's
    * SMA block-skip (doradb-storage/src/col/sma.rs:9-44, attr.rs:30-60)
    * done at Spark's partition granularity. */
  private def allSlices: Seq[RangePartition] = {
    val n = math.max(1, slices)
    val span = math.max(0L, rhi - rlo)
    (0 until n).map { i =>
      RangePartition(rlo + span * i / n, rlo + span * (i + 1) / n)
    }
  }
  private def surviving: Seq[RangePartition] =
    allSlices.filter { p =>
      p.start < p.end && {
        // the synopsis is only valid where sq = id² is exact AND
        // monotone in int64 (id ≤ √Long.MaxValue); beyond that the
        // generated column itself wraps, so the slice must be kept —
        // a real SMA degrades to no-skip the same way on a column
        // whose synopsis cannot be maintained
        p.end - 1 > RangeSource.SqExactMaxId || {
          val synMin = p.start * p.start
          val synMax = (p.end - 1) * (p.end - 1)
          synMax >= sqMin && synMin <= sqMax
        }
      }
    }

  /** Surfaced in EXPLAIN — the spec greps for the narrowed bounds and
    * the zone-skip count. */
  override def description(): String =
    s"graft-range bounds=[$lo, $hi) pushed=$nPushed zone=$nZone " +
      s"psma=${psmaProbes.length} " +
      s"parts=${surviving.length}/${allSlices.length} " +
      (if (limited) "limited=true " else "") +
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
    new RangeReaderFactory(required, psmaProbes)

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

class RangeReaderFactory(required: StructType,
    psmaProbes: Seq[(String, Long)] = Nil)
    extends PartitionReaderFactory {

  /** Emission bounds for a partition: the PSMA-probed sub-range when
    * equality probes are present (conjunction ⇒ sub-range
    * intersection), the whole partition otherwise. One position table
    * per probed column per partition; the skipped-row delta feeds the
    * [[RangeSource.psmaSkippedRows]] witness. */
  private def emitBounds(rp: RangePartition): (Long, Long) =
    if (psmaProbes.isEmpty) (rp.start, rp.end)
    else {
      var s = rp.start
      var e = rp.end
      psmaProbes.groupBy(_._1).foreach { case (colName, probes) =>
        val psma = new Psma(rp.start, rp.end, RangeSource.LongGen(colName))
        probes.foreach { case (_, v) =>
          val (ps, pe) = psma.probe(v)
          s = math.max(s, ps); e = math.min(e, pe)
        }
      }
      if (e < s) e = s
      RangeSource.psmaSkippedRows.add((rp.end - rp.start) - (e - s))
      (s, e)
    }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangePartition]
    val (emitStart, emitEnd) = emitBounds(rp)
    new PartitionReader[InternalRow] {
      private var cur = emitStart - 1
      // resolve the pruned projection ONCE per partition, not per row
      private val cols: Array[Long => Any] = required.fieldNames.map {
        case "par" => (id: Long) => RangeSource.par(id)
        case other => RangeSource.LongGen(other)
      }
      override def next(): Boolean = { cur += 1; cur < emitEnd }
      override def get(): InternalRow = {
        val vals = new Array[Any](cols.length)
        var i = 0
        while (i < cols.length) { vals(i) = cols(i)(cur); i += 1 }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }

  /** Columnar read path — the Tungsten-idiomatic mirror of the
    * reference's columnar block storage (doradb-storage/src/col): rows
    * are generated straight into on-heap column vectors in 4096-row
    * batches, and Spark's whole-stage codegen consumes the batch
    * through its vectorized ColumnarToRow bridge instead of one
    * virtual call per row. Same pruned projection contract as the row
    * reader.
    *
    * The `seg` column mirrors the reference's `Codec::Single` (RLE-1
    * constant vector, doradb-storage/src/col/codec/mod.rs:9-33): when
    * requested, batches are CAPPED at segment boundaries so seg is
    * constant over every batch, and it is served through Spark's
    * [[ConstantColumnVector]] — one value set per batch instead of n
    * putLongs. At 100 TB this is the decode-bandwidth shape: a
    * block-constant attribute costs O(1) per vector, not O(rows). */
  override def supportColumnarReads(p: InputPartition): Boolean =
    p.isInstanceOf[RangePartition]

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.{ConstantColumnVector, OnHeapColumnVector}
    import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
    val rp = p.asInstanceOf[RangePartition]
    val (emitStart, emitEnd) = emitBounds(rp)
    val batchSize = 4096
    new PartitionReader[ColumnarBatch] {
      private var cur = emitStart
      private val hasSeg = required.fieldNames.contains("seg")
      private val vectors: Array[ColumnVector] = required.fields.map { f =>
        if (f.name == "seg")
          new ConstantColumnVector(batchSize, LongType): ColumnVector
        else if (f.name == "par")
          // packed-bool bitmap vector (Codec::Bitmap mirror)
          new BitmapColumnVector(batchSize): ColumnVector
        else {
          val v = new OnHeapColumnVector(batchSize, f.dataType)
          v: ColumnVector
        }
      }
      private val batch = new ColumnarBatch(vectors)
      private val fills: Array[(OnHeapColumnVector, Int, Long) => Unit] =
        required.fieldNames.map {
          // seg/par fill through their own vector kinds (constant /
          // bitmap), not the on-heap long path
          case "seg" | "par" => (_: OnHeapColumnVector, _: Int, _: Long) => ()
          case other =>
            val g = RangeSource.LongGen(other)
            (v: OnHeapColumnVector, i: Int, id: Long) => v.putLong(i, g(id))
        }
      override def next(): Boolean = {
        if (cur >= emitEnd) return false
        var n = math.min(batchSize.toLong, emitEnd - cur)
        if (hasSeg) {
          // cap at the next segment boundary — seg is then constant
          // over the whole batch by construction
          val boundary =
            (cur / RangeSource.SegRows + 1) * RangeSource.SegRows
          n = math.min(n, boundary - cur)
        }
        val rows = n.toInt
        var c = 0
        while (c < vectors.length) {
          vectors(c) match {
            case cv: ConstantColumnVector =>
              cv.setLong(cur / RangeSource.SegRows)
              RangeSource.constantSegBatches.increment()
            case bv: BitmapColumnVector =>
              bv.clear()
              var i = 0
              while (i < rows) {
                bv.setBit(i, RangeSource.par(cur + i)); i += 1
              }
              RangeSource.bitmapParBatches.increment()
            case ov: OnHeapColumnVector =>
              ov.reset()
              val fill = fills(c)
              var i = 0
              while (i < rows) { fill(ov, i, cur + i); i += 1 }
          }
          c += 1
        }
        batch.setNumRows(rows)
        cur += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}
