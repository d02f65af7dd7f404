package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Money

/** Property tests for the exact-decimal money arithmetic that underpins
  * every oracle comparison (2-decimal doubles must aggregate exactly,
  * independent of partition order). */
class MoneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val centsList: Gen[List[Long]] =
    Gen.listOfN(200, Gen.choose(-10000000L, 10000000L))

  test("dsum of 2-decimal doubles equals exact BigDecimal sum") {
    import spark.implicits._
    (0 until 10).foreach { i =>
      val cs = centsList(Gen.Parameters.default, Seed(42L + i)).get
      val doubles = cs.map(c => c / 100.0)
      val expected = (cs.map(BigDecimal(_)).sum / 100).toDouble
      val got = doubles.toDF("x")
        .repartition(7) // force a different partial-agg order than input
        .agg(Money.dsum(Money.m(col("x")))).collect()(0).getDouble(0)
      assert(got == expected, s"iteration $i")
    }
  }

  test("discPrice/charge stay exact for in-range rates") {
    import spark.implicits._
    val rows = Seq((19999.99, 0.05, 0.08), (0.01, 0.0, 0.0), (99999.5, 0.10, 0.02))
    val got = rows.toDF("p", "d", "t")
      .select(
        Money.discPrice(col("p"), col("d")).cast("double"),
        Money.charge(col("p"), col("d"), col("t")).cast("double"))
      .collect()
    rows.zip(got).foreach { case ((p, d, t), r) =>
      val bp = BigDecimal(p).setScale(2)
      val expDisc = bp * (1 - BigDecimal(d).setScale(2))
      val expCharge = expDisc * (1 + BigDecimal(t).setScale(2))
      assert(r.getDouble(0) == expDisc.toDouble)
      assert(r.getDouble(1) == expCharge.toDouble)
    }
  }
}
