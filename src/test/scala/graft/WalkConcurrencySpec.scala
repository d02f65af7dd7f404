package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Round-19 contract for the walk's session-conf flip under
  * CONCURRENCY (the round-18 spec covered only the single-threaded
  * case): the SQL-server path serves each connection on its own
  * thread, and before the flip was serialized two overlapping walks
  * could interleave set/restore so one walk re-read the other's
  * degraded values (AQE off, 8 shuffle partitions) as the "previous"
  * state and leaked them permanently. The walk now runs its
  * flip + body + restore under a lock; this spec drives two walks
  * concurrently through the public serve path and asserts both confs
  * come back pristine and both walks return the single-threaded
  * result. */
class WalkConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two concurrent walks restore both session confs and agree " +
    "with the single-threaded serve") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(aqeKey)
    val prevSp = spark.conf.get(spKey)
    def dump(): Seq[Seq[Any]] =
      Similarity.graphBeamTopK(spark, TestSpark.Sf, Similarity.TopK)
        .orderBy("query_id", "rnk").collect().map(_.toSeq).toSeq
    val expected = dump()
    assert(expected.nonEmpty)
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val runs = Future.sequence(Seq(Future(dump()), Future(dump())))
      val results = Await.result(runs, 10.minutes)
      results.foreach(r =>
        assert(r == expected, "concurrent walk diverged from serial"))
    } finally pool.shutdown()
    assert(spark.conf.get(aqeKey) == prevAqe,
      "concurrent walks leaked spark.sql.adaptive.enabled")
    assert(spark.conf.get(spKey) == prevSp,
      "concurrent walks leaked spark.sql.shuffle.partitions")
  }
}
