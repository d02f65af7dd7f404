package graft.types

import org.apache.spark.sql.types._

/** The reference's logical type system re-expressed on Spark types —
  * SURVEY §1.2/§1.5, mirroring `PreciseType`
  * (doradb-datatype/src/lib.rs:21-62) and `Collation` (lib.rs:466-470).
  *
  * The load-bearing rules:
  * - Spark has no unsigned integers, so `Int(n, unsigned=true)` widens
  *   to the NEXT signed type that holds the full unsigned range
  *   (u8 → Short, u16 → Int, u24 → Int, u32 → Long, u64 → Decimal(20,0)
  *   — 2⁶⁴-1 needs 20 digits). Lossless by construction.
  * - `Binary` collation means byte-string semantics
  *   (lib.rs:201-203 `runtime_ty`) → BinaryType; Ascii/Utf8mb4 →
  *   StringType (Spark strings are UTF-8; ASCII is a subset).
  * - `Datetime` is zone-less in the reference's MySQL lineage →
  *   TimestampNTZType (NOT TimestampType, which is session-zoned).
  * - `Interval` maps by unit family: Year/Quarter/Month are
  *   YearMonthIntervalType; Day…Microsecond are DayTimeIntervalType
  *   (Spark's ANSI interval split; the reference's single Interval
  *   struct spans both — lib.rs:487-490).
  * - `Compound` is rejected exactly like the reference
  *   ("currently not support", lib.rs:60-61).
  */
object TypeMap {

  sealed trait Collation
  object Collation {
    case object Ascii extends Collation
    case object Utf8mb4 extends Collation
    case object Binary extends Collation
  }

  /** Logical types, 1:1 with the reference's PreciseType variants. */
  sealed trait PreciseType
  object PreciseType {
    case object Unknown extends PreciseType
    case object Null extends PreciseType
    /** bytes ∈ {1, 2, 3, 4, 8}. */
    final case class Int(bytes: scala.Int, unsigned: Boolean) extends PreciseType
    final case class Decimal(precision: scala.Int, fraction: scala.Int) extends PreciseType
    /** bytes ∈ {4, 8}. */
    final case class Float(bytes: scala.Int) extends PreciseType
    case object Bool extends PreciseType
    case object Date extends PreciseType
    final case class Time(frac: scala.Int) extends PreciseType
    final case class Datetime(frac: scala.Int) extends PreciseType
    final case class Interval(unit: TimeUnit) extends PreciseType
    final case class Char(len: scala.Int, collation: Collation) extends PreciseType
    final case class Varchar(len: scala.Int, collation: Collation) extends PreciseType
    case object Compound extends PreciseType
  }

  /** Microsecond…Year, doradb-datatype/src/lib.rs:435-445. */
  sealed trait TimeUnit
  object TimeUnit {
    case object Microsecond extends TimeUnit
    case object Second extends TimeUnit
    case object Minute extends TimeUnit
    case object Hour extends TimeUnit
    case object Day extends TimeUnit
    case object Week extends TimeUnit
    case object Month extends TimeUnit
    case object Quarter extends TimeUnit
    case object Year extends TimeUnit
  }

  import PreciseType._

  def toSpark(t: PreciseType): DataType = t match {
    case Unknown | Null => NullType
    case Int(b, false) => b match {
      case 1 => ByteType
      case 2 => ShortType
      case 3 | 4 => IntegerType
      case 8 => LongType
      case n => throw new IllegalArgumentException(s"Int($n) unsupported")
    }
    case Int(b, true) => b match {
      case 1 => ShortType          // u8 max 255 > Byte.MaxValue
      case 2 => IntegerType        // u16 max 65535 > Short.MaxValue
      case 3 => IntegerType        // u24 max 16M fits Int
      case 4 => LongType           // u32 max 4.2e9 > Int.MaxValue
      case 8 => DecimalType(20, 0) // u64 max 1.8e19 > Long.MaxValue
      case n => throw new IllegalArgumentException(s"Int($n) unsupported")
    }
    case Decimal(p, f) => DecimalType(p, f)
    case Float(4) => FloatType
    case Float(8) => DoubleType
    case Float(n) => throw new IllegalArgumentException(s"Float($n) unsupported")
    case Bool => BooleanType
    case Date => DateType
    // NOT a deviation: Spark 4.1 added a native TIME type (TimeType,
    // fractional precision 0-6), so the reference's Time(frac)
    // (doradb-datatype/src/lib.rs:21-62) maps 1:1 — earlier Spark
    // versions would have needed a documented fallback (e.g. micros-
    // since-midnight BIGINT). frac carries through as the precision.
    case Time(frac) => TimeType(frac)
    case Datetime(_) => TimestampNTZType // µs precision, zone-less
    case Interval(u) => u match {
      case TimeUnit.Year | TimeUnit.Quarter | TimeUnit.Month =>
        YearMonthIntervalType()
      case _ => DayTimeIntervalType()
    }
    case Char(_, Collation.Binary) | Varchar(_, Collation.Binary) => BinaryType
    // Ascii/Utf8mb4 map to StringType under Spark's default UTF8_BINARY
    // collation. MySQL's utf8mb4 default (utf8mb4_0900_ai_ci) is case-
    // AND accent-insensitive; Spark 4's UTF8_LCASE covers the case-
    // insensitive half and is the documented migration path — executed
    // and oracle-pinned by types_collation_ci / types_collation_ci_group
    // (TypesQueries.scala). We deliberately do NOT default Utf8mb4
    // columns to a collated StringType: accent folding would still
    // deviate, and a silent CI default changes join/group cardinalities;
    // callers opt in per expression with collate(s, "UTF8_LCASE").
    case Char(_, _) | Varchar(_, _) => StringType
    case Compound =>
      // matches the reference: doradb-datatype/src/lib.rs:60-61
      throw new UnsupportedOperationException("Compound types not supported")
  }

  /** Physical runtime type after the reference's narrow-int promotion:
    * ints below 4 bytes compute as 32-bit (lib.rs:184-193). */
  def runtimeType(t: PreciseType): DataType = t match {
    case Int(b, false) if b < 4 => IntegerType
    case Int(b, true) if b < 4 => IntegerType // u8/u16/u24 fit i32
    case other => toSpark(other)
  }
}
