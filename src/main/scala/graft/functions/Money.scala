package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact-decimal money arithmetic over the double-typed fixture columns.
  *
  * The fixtures store money as 2-decimal doubles (FIXTURES.md §2). Casting
  * to DECIMAL before aggregating makes every sum exact and therefore
  * bit-identical across engines (Spark vs the DuckDB oracle), independent
  * of partial-aggregation order — floating-point sums are NOT, their
  * error depends on shuffle ordering. The final cast back to double is a
  * single deterministic rounding of an exact value.
  *
  * Reference analogue: doradb plans TPC-H money as Decimal(18,2)
  * (doradb-tpch-tests/src/lib.rs:17-28); we use (12,2) so that products
  * of three factors stay well under decimal(38,_) in both engines.
  */
object Money {
  val M: DecimalType = DecimalType(12, 2)  // money / quantity
  val R: DecimalType = DecimalType(4, 2)   // rates: discount, tax in [0, 1.1]

  def m(c: Column): Column = c.cast(M)
  /** (1 - rate) as an exact decimal(4,2). */
  def oneMinus(c: Column): Column = (lit(1) - c.cast(R)).cast(R)
  /** (1 + rate) as an exact decimal(4,2). */
  def onePlus(c: Column): Column = (lit(1) + c.cast(R)).cast(R)

  /** price * (1 - discount) — the TPC-H revenue term, exact. */
  def discPrice(price: Column, disc: Column): Column = m(price) * oneMinus(disc)
  /** price * (1 - discount) * (1 + tax), exact. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    m(price) * oneMinus(disc) * onePlus(tax)

  /** Exact decimal sum surfaced as double (canonical output type). */
  def dsum(c: Column): Column = sum(c).cast(DoubleType)
  /** Exact mean: decimal sum cast to double, divided by count — identical
    * IEEE division in both engines. */
  def davg(c: Column): Column = sum(c).cast(DoubleType) / count(c)

  // --- SQL-side mirrors for oracle strings (DuckDB dialect) -------------
  def sqlM(col: String): String = s"cast($col as decimal(12,2))"
  def sqlOneMinus(col: String): String =
    s"cast(1 - cast($col as decimal(4,2)) as decimal(4,2))"
  def sqlOnePlus(col: String): String =
    s"cast(1 + cast($col as decimal(4,2)) as decimal(4,2))"
  def sqlDiscPrice(p: String, d: String): String =
    s"${sqlM(p)} * ${sqlOneMinus(d)}"
  def sqlCharge(p: String, d: String, t: String): String =
    s"${sqlM(p)} * ${sqlOneMinus(d)} * ${sqlOnePlus(t)}"
}
