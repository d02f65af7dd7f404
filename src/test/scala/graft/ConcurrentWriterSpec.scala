package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dml

/** Optimistic concurrency on the versioned MERGE target: two REAL
  * threads race `commitOptimistic`, a barrier pins both to the same
  * base version so the CAS race is witnessed (not a scheduling
  * accident), and the spec proves the protocol's three contracts —
  * disjoint writers both commit (one via retry) and the result is a
  * serial order; overlapping writers abort with a conflict; the losing
  * attempt's orphaned generation is exactly the class vacuum
  * reclaims. */
class ConcurrentWriterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshRoot(): String = {
    val root =
      java.nio.file.Files.createTempDirectory("graft-ccw-spec").toString
    val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
    base.write.partitionBy("yr").parquet(s"$root/data/g0")
    val years = base.select(col("yr")).distinct()
      .collect().map(_.getInt(0)).sorted
    Dml.writeManifest(root, 0, years.map(y => y -> s"data/g0/yr=$y").toMap)
    root
  }

  private def race(root: String, years: Seq[Int])
      : Seq[Either[Throwable, Dml.CommitOutcome]] = {
    val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[Throwable, Dml.CommitOutcome]]()
    val threads = years.zipWithIndex.map { case (y, i) =>
      val t = new Thread(() =>
        out.add(
          try Right(Dml.commitOptimistic(spark, root, s"w${i + 1}",
            Dml.mergePrunedBatch(base, y),
            preCommit = a => if (a == 1) {
              barrier.await(60, java.util.concurrent.TimeUnit.SECONDS); ()
            }))
          catch { case e: Throwable => Left(e) }))
      t.start(); t
    }
    threads.foreach(_.join())
    out.toArray(Array.empty[Either[Throwable, Dml.CommitOutcome]]).toSeq
  }

  private def state(root: String): Seq[(Long, Long, Int)] =
    Dml.readVersionAsOf(spark, root, Dml.timeTravelVersions(root).max)
      .select(col("o_orderkey"), col("cents"), col("yr"))
      .orderBy(col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("disjoint writers: both commit, exactly one retry, final state " +
    "is the serial order") {
    val root = freshRoot()
    try {
      val outcomes = race(root, Dml.TimeTravelYears.take(2))
      val oks = outcomes.collect { case Right(o) => o }
      assert(outcomes.forall(_.isRight),
        s"a disjoint writer failed: $outcomes")
      assert(oks.map(_.attempts).sorted == Seq(1, 2),
        s"expected exactly one CAS loss + retry, got $oks")
      assert(oks.map(_.version).sorted == Seq(1, 2))
      // serial replay on a second root: apply the same two batches
      // sequentially; disjoint partitions commute, so BOTH serial
      // orders equal the raced result
      val serial =
        java.nio.file.Files.createTempDirectory("graft-ccw-serial").toString
      try {
        val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
        base.write.partitionBy("yr").parquet(s"$serial/data/g0")
        val years = base.select(col("yr")).distinct()
          .collect().map(_.getInt(0)).sorted
        Dml.writeManifest(serial, 0,
          years.map(y => y -> s"data/g0/yr=$y").toMap)
        Dml.TimeTravelYears.take(2).zipWithIndex.foreach { case (y, i) =>
          Dml.applyTimeTravelBatch(spark, serial, i + 1,
            Dml.mergePrunedBatch(base, y))
        }
        assert(state(root) == state(serial),
          "raced final state diverged from the serial apply")
      } finally graft.plans.Scratch.deleteTree(serial)
    } finally graft.plans.Scratch.deleteTree(root)
  }

  test("the losing attempt's generation is orphaned on disk and " +
    "vacuum reclaims exactly it") {
    val root = freshRoot()
    try {
      race(root, Dml.TimeTravelYears.take(2))
      def partDirs(): Set[String] = {
        val dataRoot = new java.io.File(s"$root/data")
        (for (g <- Option(dataRoot.listFiles()).toSeq.flatten
                if g.isDirectory;
              p <- Option(g.listFiles()).toSeq.flatten if p.isDirectory)
          yield s"data/${g.getName}/${p.getName}").toSet
      }
      val referenced = Dml.timeTravelVersions(root)
        .flatMap(k => Dml.readManifest(root, k).values).toSet
      val orphans = partDirs() -- referenced
      assert(orphans.nonEmpty,
        "expected the CAS loser's abandoned generation on disk")
      assert(orphans.forall(_.contains("-a1")),
        s"orphans must be first-attempt dirs: $orphans")
      val before = state(root)
      // retain every version: vacuum may delete ONLY the orphans
      Dml.vacuumTimeTravel(root, Dml.timeTravelVersions(root).size)
      assert(partDirs() == referenced, "vacuum missed or over-deleted")
      assert(state(root) == before, "vacuum changed the served state")
    } finally graft.plans.Scratch.deleteTree(root)
  }

  test("DV-only writer races a MERGE writer: disjoint partitions both " +
    "commit (one retry), the DV commit's diff names only its " +
    "partition, and an OVERLAPPING DV delete aborts") {
    // the executed disjoint race lives in the entry's memoized root
    // (its build REQUIRES attempts == Seq(1, 2)); here re-verify the
    // lineage and the diff scope on it
    val root = Dml.dvConcurrentRoot(spark, TestSpark.Sf)
    assert(Dml.timeTravelVersions(root) == Seq(0, 1, 2))
    val diffs = (1 to 2).map { v =>
      val a = Dml.readManifestFull(root, v - 1)
      val b = Dml.readManifestFull(root, v)
      (a.keySet ++ b.keySet).filter(y => a.get(y) != b.get(y))
    }
    // one version's diff is the upsert's partition, the other's the
    // DV's — each exactly one year, disjoint
    assert(diffs.map(_.size) == Seq(1, 1) && diffs(0) != diffs(1),
      s"unexpected commit scopes: $diffs")
    assert(diffs.flatten.toSet ==
      Set(Dml.TimeTravelYears.head, Dml.TimeTravelYears(1)))
    // the DV commit appended a sidecar and repointed no data dir
    val dvYear = Dml.TimeTravelYears.head
    val withDv = (1 to 2).find(v =>
      Dml.readManifestFull(root, v)(dvYear).dvs.nonEmpty).get
    val e = Dml.readManifestFull(root, withDv)(dvYear)
    assert(e.data == s"data/g0/yr=$dvYear",
      "the DV-only commit repointed its partition's data dir")
    // overlap: a DV delete on the SAME year as a racing upsert aborts
    val root2 = freshRoot()
    try {
      val y = Dml.TimeTravelYears(1)
      val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val gate: Int => Unit = a => if (a == 1) {
        barrier.await(60, java.util.concurrent.TimeUnit.SECONDS); ()
      }
      val out = new java.util.concurrent.ConcurrentLinkedQueue[
        Either[Throwable, Dml.CommitOutcome]]()
      val threads = Seq(
        new Thread(() => out.add(
          try Right(Dml.commitOptimistic(spark, root2, "up",
            Dml.mergePrunedBatch(base, y), preCommit = gate))
          catch { case ex: Throwable => Left(ex) })),
        new Thread(() => out.add(
          try Right(Dml.commitDvOptimistic(spark, root2, "dv", Seq(y),
            col("o_orderkey") % 20 === Dml.DvVersionedMod,
            preCommit = gate))
          catch { case ex: Throwable => Left(ex) })))
      threads.foreach(_.start()); threads.foreach(_.join())
      val res = out.toArray(
        Array.empty[Either[Throwable, Dml.CommitOutcome]]).toSeq
      val oks = res.collect { case Right(o) => o }
      val errs = res.collect { case Left(ex) => ex }
      assert(oks.size == 1 && errs.size == 1,
        s"expected one winner and one abort, got $res")
      assert(errs.head.getMessage.contains("write-write conflict"),
        s"unexpected abort: ${errs.head}")
      assert(Dml.timeTravelVersions(root2).max == 1)
    } finally graft.plans.Scratch.deleteTree(root2)
  }

  test("overlapping writers: one commits, the other aborts with a " +
    "write-write conflict, and the winner's state stands") {
    val root = freshRoot()
    try {
      val y = Dml.TimeTravelYears.head
      val outcomes = race(root, Seq(y, y))
      val oks = outcomes.collect { case Right(o) => o }
      val errs = outcomes.collect { case Left(e) => e }
      assert(oks.size == 1 && errs.size == 1,
        s"expected one winner and one abort, got $outcomes")
      assert(oks.head.attempts == 1 && oks.head.version == 1)
      assert(errs.head.isInstanceOf[IllegalStateException] &&
        errs.head.getMessage.contains("write-write conflict"),
        s"unexpected abort: ${errs.head}")
      // the aborted writer published nothing: head is the winner's v1,
      // equal to one serial batch apply
      assert(Dml.timeTravelVersions(root).max == 1)
      val serial =
        java.nio.file.Files.createTempDirectory("graft-ccw-serial1").toString
      try {
        val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
        base.write.partitionBy("yr").parquet(s"$serial/data/g0")
        val years = base.select(col("yr")).distinct()
          .collect().map(_.getInt(0)).sorted
        Dml.writeManifest(serial, 0,
          years.map(yy => yy -> s"data/g0/yr=$yy").toMap)
        Dml.applyTimeTravelBatch(spark, serial, 1,
          Dml.mergePrunedBatch(base, y))
        assert(state(root) == state(serial))
      } finally graft.plans.Scratch.deleteTree(serial)
    } finally graft.plans.Scratch.deleteTree(root)
  }
}
