package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive three-valued-logic semantics (SURVEY §5 (d)): the
  * engine's XOR / NOT / IS-forms / SafeEqual must follow the
  * reference's flip tables (doradb-expr/src/pred.rs:100-144) and SQL
  * 3VL on EVERY combination of TRUE/FALSE/NULL — all 9 pairs evaluated
  * through actual Spark expressions in one DataFrame pass, which also
  * exercises both codegen and constant-folded paths.
  */
class ThreeValuedLogicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val domain: Seq[Option[Boolean]] =
    Seq(Some(true), Some(false), None)

  private lazy val rows: Map[(Option[Boolean], Option[Boolean]),
      org.apache.spark.sql.Row] = {
    val pairs = for { a <- domain; b <- domain } yield (a, b)
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      (col("a") =!= col("b")).as("xor"),      // engine's logical XOR form
      (!col("a")).as("not_a"),
      (col("a") <=> col("b")).as("safe_eq"),
      (col("a") <=> lit(true)).as("is_true"))
    df.collect().map { r =>
      val a = if (r.isNullAt(0)) None else Some(r.getBoolean(0))
      val b = if (r.isNullAt(1)) None else Some(r.getBoolean(1))
      (a, b) -> r
    }.toMap
  }

  private def opt(r: org.apache.spark.sql.Row, i: Int): Option[Boolean] =
    if (r.isNullAt(i)) None else Some(r.getBoolean(i))

  test("XOR via boolean <> matches MySQL 3VL (NULL if either side NULL)") {
    for { a <- domain; b <- domain } {
      val expected = for { x <- a; y <- b } yield x ^ y
      assert(opt(rows((a, b)), 2) == expected, s"a=$a b=$b")
    }
  }

  test("NOT follows the flip table incl. NULL passthrough") {
    for { a <- domain; b <- domain }
      assert(opt(rows((a, b)), 3) == a.map(!_), s"a=$a")
  }

  test("SafeEqual is never NULL and equates NULLs") {
    for { a <- domain; b <- domain } {
      val r = rows((a, b))
      assert(!r.isNullAt(4))
      assert(r.getBoolean(4) == (a == b), s"a=$a b=$b")
    }
  }

  test("IS TRUE form (<=> true) collapses NULL to false") {
    for { a <- domain; b <- domain } {
      val r = rows((a, b))
      assert(!r.isNullAt(5))
      assert(r.getBoolean(5) == a.contains(true), s"a=$a")
    }
  }
}
