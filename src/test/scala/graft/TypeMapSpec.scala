package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Explain
import graft.types.TypeMap
import graft.types.TypeMap.{Collation, PreciseType => P, TimeUnit => U}

/** SURVEY §7.1 `types/` layer: PreciseType → Spark DataType mapping
  * (unsigned widening, collations, zone-less datetime, interval split)
  * plus the EXPLAIN user surface. */
class TypeMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("signed ints map 1:1; 3-byte packs into IntegerType") {
    assert(TypeMap.toSpark(P.Int(1, unsigned = false)) == ByteType)
    assert(TypeMap.toSpark(P.Int(2, unsigned = false)) == ShortType)
    assert(TypeMap.toSpark(P.Int(3, unsigned = false)) == IntegerType)
    assert(TypeMap.toSpark(P.Int(4, unsigned = false)) == IntegerType)
    assert(TypeMap.toSpark(P.Int(8, unsigned = false)) == LongType)
  }

  test("unsigned ints widen to the next signed type that holds the range") {
    assert(TypeMap.toSpark(P.Int(1, unsigned = true)) == ShortType)
    assert(TypeMap.toSpark(P.Int(2, unsigned = true)) == IntegerType)
    assert(TypeMap.toSpark(P.Int(4, unsigned = true)) == LongType)
    assert(TypeMap.toSpark(P.Int(8, unsigned = true)) == DecimalType(20, 0))
    // max-of-range survives the u64 mapping losslessly
    val df = spark.range(1).select(
      lit("18446744073709551615").cast(TypeMap.toSpark(P.Int(8, unsigned = true)))
        .as("u64max"))
    assert(df.collect()(0).getDecimal(0).toString == "18446744073709551615")
  }

  test("collations: Binary is byte-string, Ascii/Utf8mb4 are StringType") {
    assert(TypeMap.toSpark(P.Varchar(10, Collation.Binary)) == BinaryType)
    assert(TypeMap.toSpark(P.Char(10, Collation.Binary)) == BinaryType)
    assert(TypeMap.toSpark(P.Varchar(10, Collation.Utf8mb4)) == StringType)
    assert(TypeMap.toSpark(P.Char(10, Collation.Ascii)) == StringType)
  }

  test("temporal + interval + scalar mappings") {
    assert(TypeMap.toSpark(P.Date) == DateType)
    assert(TypeMap.toSpark(P.Datetime(6)) == TimestampNTZType)
    assert(TypeMap.toSpark(P.Time(3)) == TimeType(3))
    assert(TypeMap.toSpark(P.Interval(U.Month)) == YearMonthIntervalType())
    assert(TypeMap.toSpark(P.Interval(U.Second)) == DayTimeIntervalType())
    assert(TypeMap.toSpark(P.Decimal(18, 2)) == DecimalType(18, 2))
    assert(TypeMap.toSpark(P.Float(4)) == FloatType)
    assert(TypeMap.toSpark(P.Bool) == BooleanType)
  }

  test("Compound rejected like the reference; narrow ints compute as i32") {
    intercept[UnsupportedOperationException](TypeMap.toSpark(P.Compound))
    assert(TypeMap.runtimeType(P.Int(2, unsigned = false)) == IntegerType)
    assert(TypeMap.runtimeType(P.Int(2, unsigned = true)) == IntegerType)
    assert(TypeMap.runtimeType(P.Int(8, unsigned = false)) == LongType)
  }

  test("EXPLAIN user surface returns a physical plan with the scan") {
    Tables.registerAll(spark, TestSpark.Sf)
    val txt = Explain.explainSql(spark,
      "select n_name from nation where n_regionkey = 1")
    assert(txt.contains("== Physical Plan =="))
    assert(txt.toLowerCase.contains("scan"))
    val cost = Explain.explainSql(spark,
      "select count(*) from nation", mode = "cost")
    assert(cost.contains("Statistics") || cost.contains("sizeInBytes"))
  }
}
