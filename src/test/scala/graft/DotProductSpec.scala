package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProduct, Vectors}

/** The custom Catalyst expression `graft_dot`: registration (both the
  * extensions route and imperative), bit-identity with the interpreted
  * higher-order-function fold, and codegen participation. */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot is registered via extensions and callable from SQL") {
    // TestSpark builds through Session.builder → withExtensions
    val v = spark.sql(
      "select graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .collect()(0).getDouble(0)
    assert(v == 32.0)
  }

  test("native dot is bit-identical to the interpreted fold on fixtures") {
    DotProduct.ensureRegistered(spark)
    val emb = Tables.df(spark, TestSpark.Sf, "embeddings")
      .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
    val a = emb.select(col("vec_id").as("i"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("j"), col("v").as("vb"))
    val both = a.crossJoin(b).limit(5000)
      .select(
        Vectors.dot(col("va"), col("vb")).as("hof"),
        Vectors.dotNative(col("va"), col("vb")).as("native"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null inputs propagate null") {
    DotProduct.ensureRegistered(spark)
    val r = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
      .select(Vectors.dotNative(col("a"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("length mismatch and null elements yield null, matching Vectors.dot") {
    DotProduct.ensureRegistered(spark)
    // mismatched dimensions: NULL, not a silently truncated sum
    val m = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .select(Vectors.dotNative(col("a"), col("b")).as("d"),
        Vectors.dot(col("a"), col("b")).as("ref"))
      .collect()(0)
    assert(m.isNullAt(0) && m.isNullAt(1),
      "both kernels must surface a dimension mismatch as null")
    // a null ELEMENT poisons the dot the same way
    val e = spark.sql(
      "select graft_dot(array(1.0d, cast(null as double)), " +
        "array(1.0d, 2.0d)) as d")
      .collect()(0)
    assert(e.isNullAt(0))
  }
}
