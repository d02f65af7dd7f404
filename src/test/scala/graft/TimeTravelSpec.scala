package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dml

/** Generation-swapped time travel: the oracle hash-verifies the
  * `VERSION AS OF 2` VALUES; these specs pin the lifecycle contracts
  * the values can't show — every retained version reads as the exact
  * k-batch replay, untouched partitions share files byte-for-byte
  * across manifests (no copy-per-version), and vacuum reclaims exactly
  * the unreferenced generations while retained versions keep reading
  * identically. */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Replay k upsert batches against the base with plain DataFrame ops
    * — the independent ground truth for version k. */
  private def replay(k: Int): Seq[(Long, Long, Int)] = {
    val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
    val state = Dml.TimeTravelYears.take(k).foldLeft(base) { (cur, y) =>
      val batch = Dml.mergePrunedBatch(base, y)
      cur.join(batch.select(col("o_orderkey")), Seq("o_orderkey"),
          "left_anti")
        .unionByName(batch)
    }
    state.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted
  }

  private def readV(root: String, k: Int): Seq[(Long, Long, Int)] =
    Dml.readVersionAsOf(spark, root, k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq.sorted

  test("every version reads as the exact k-batch replay") {
    val root = Dml.timeTravelRoot(spark, TestSpark.Sf)
    (0 to Dml.TimeTravelYears.size).foreach { k =>
      assert(readV(root, k) == replay(k), s"version $k diverged")
    }
  }

  test("untouched partitions are SHARED across manifests, not copied") {
    val root = Dml.timeTravelRoot(spark, TestSpark.Sf)
    val last = Dml.TimeTravelYears.size
    val m0 = Dml.readManifest(root, 0)
    val mLast = Dml.readManifest(root, last)
    val untouched = m0.keySet -- Dml.TimeTravelYears.toSet
    assert(untouched.nonEmpty, "fixture has no untouched years")
    untouched.foreach { y =>
      assert(mLast(y) == m0(y),
        s"untouched year $y repointed: ${m0(y)} -> ${mLast(y)}")
    }
    // and each touched year points at ITS batch's generation
    Dml.TimeTravelYears.zipWithIndex.foreach { case (y, i) =>
      assert(mLast(y) == s"data/g${i + 1}/yr=$y",
        s"touched year $y not at generation ${i + 1}: ${mLast(y)}")
    }
  }

  test("change feed is value-based: the CDC transition emits ONLY its " +
      "deletes (re-asserted U/I rows produce no change rows)") {
    val root = Dml.timeTravelRoot(spark, TestSpark.Sf)
    val last = Dml.timeTravelVersions(root).max
    val rows = Dml.versionChanges(spark, root, last)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty, "CDC transition produced no change rows")
    assert(rows.forall(_._1 == "delete"),
      s"non-delete change rows in the CDC transition: ${rows.take(5)}")
    val y1 = Dml.TimeTravelYears.head
    rows.foreach { case (_, k) =>
      assert(k % 20 == 5, s"unexpected deleted key $k")
    }
    // and an upsert transition pairs its pre/post images exactly
    val t1 = Dml.versionChanges(spark, root, 1)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val pre = t1.filter(_._1 == "update_preimage").map(r => r._2).sorted
    val post = t1.filter(_._1 == "update_postimage").map(r => r._2).sorted
    assert(pre.nonEmpty && pre.sameElements(post),
      "update pre/post images not paired")
    assert(t1.count(_._1 == "insert") == pre.length,
      s"year-$y1 batch mints one insert per updated key")
  }

  test("change feed scans ONLY the partitions whose manifest entry " +
      "changed (manifest-diff pruning, inputFiles-proven)") {
    val root = Dml.timeTravelRoot(spark, TestSpark.Sf)
    // transition 2 touched exactly TimeTravelYears(1): its diff may read
    // that partition's pre (g0) and post (g2) dirs — nothing else
    val y = Dml.TimeTravelYears(1)
    val files = Dml.versionChanges(spark, root, 2).inputFiles.toSeq
      .map(f => java.net.URI.create(f).getPath)
    assert(files.nonEmpty, "no input files resolved")
    val okPrefixes = Seq(s"$root/data/g0/yr=$y", s"$root/data/g2/yr=$y")
    files.foreach { f =>
      assert(okPrefixes.exists(p => f.startsWith(p)),
        s"change feed read an untouched partition's file: $f")
    }
  }

  test("full-partition delete drops the manifest entry (and surfaces " +
      "as deletes in the feed); new-partition insert creates one") {
    import spark.implicits._
    val root =
      java.nio.file.Files.createTempDirectory("graft-tt-spec2").toString
    try {
      // tiny hand-built base: two years, two keys each
      val base = Seq((1L, 10L, 2001), (2L, 20L, 2001),
        (3L, 30L, 2002), (4L, 40L, 2002))
        .toDF("o_orderkey", "cents", "yr")
      base.write.partitionBy("yr").parquet(s"$root/data/g0")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/manifests"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/manifests/v0.tsv"),
        "2001\tdata/g0/yr=2001\n2002\tdata/g0/yr=2002")
      // batch 1 deletes EVERY key of 2001 (empty inserts side)
      val delAll = base.filter(col("yr") === 2001)
      Dml.applyTimeTravelBatch(spark, root, 1, delAll, delAll.limit(0))
      val m1 = Dml.readManifest(root, 1)
      assert(!m1.contains(2001), "empty partition kept a manifest entry")
      assert(m1(2002) == "data/g0/yr=2002")
      // v1 reads cleanly without the dropped partition
      assert(Dml.readVersionAsOf(spark, root, 1)
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
      // and the feed emits exactly the two deletes
      val ch1 = Dml.versionChanges(spark, root, 1)
        .collect().map(r => (r.getString(1), r.getLong(2))).sorted.toSeq
      assert(ch1 == Seq(("delete", 1L), ("delete", 2L)), s"feed: $ch1")
      // batch 2 inserts a NEW year absent from every prior manifest
      val newYear = Seq((9L, 90L, 2050)).toDF("o_orderkey", "cents", "yr")
      Dml.applyTimeTravelBatch(spark, root, 2, newYear)
      assert(Dml.readManifest(root, 2)(2050) == "data/g2/yr=2050")
      assert(Dml.readVersionAsOf(spark, root, 2)
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 9L))
      val ch2 = Dml.versionChanges(spark, root, 2)
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(ch2 == Seq(("insert", 9L)), s"feed: $ch2")
    } finally graft.plans.Scratch.deleteTree(root)
  }

  test("restore is metadata-only and the feed shows it as the inverse " +
      "of the undone batch") {
    val root = Dml.timeTravelRestoreRoot(spark, TestSpark.Sf)
    val restored = Dml.timeTravelVersions(root).max
    // no data generation was written for the restore version
    assert(!new java.io.File(s"$root/data/g$restored").exists(),
      "restore copied data instead of the manifest")
    assert(Dml.readManifest(root, restored) == Dml.readManifest(root, 1),
      "restored manifest differs from its target version's")
    // the feed's restore transition inverts batch 2: its minted keys
    // (negative mirrors in year 2) leave as deletes, its x2 updates
    // return as update pairs
    val y2 = Dml.TimeTravelYears(1)
    val ch = Dml.versionChanges(spark, root, restored)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(4)))
    assert(ch.nonEmpty)
    val dels = ch.filter(_._1 == "delete")
    assert(dels.nonEmpty && dels.forall(r => r._2 < 0 && r._3 == y2),
      s"unexpected restore deletes: ${dels.take(3).toSeq}")
    val pre = ch.count(_._1 == "update_preimage")
    assert(pre > 0 && pre == ch.count(_._1 == "update_postimage"))
    assert(!ch.exists(_._1 == "insert"),
      "restore of an upsert batch cannot insert")
  }

  test("vacuum retains the last N versions, reclaims exactly the " +
      "unreferenced partition dirs, and retained reads are unchanged") {
    // a private root so vacuum can't disturb the shared memoized one
    val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
    val root =
      java.nio.file.Files.createTempDirectory("graft-tt-spec").toString
    try {
      base.write.partitionBy("yr").parquet(s"$root/data/g0")
      val years = base.select(col("yr")).distinct()
        .collect().map(_.getInt(0)).sorted
      // hand-rolled v0 manifest (writeManifest is private): tsv lines
      val body = years.map(y => s"$y\tdata/g0/yr=$y").mkString("\n")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/manifests"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/manifests/v0.tsv"), body)
      Dml.TimeTravelYears.zipWithIndex.foreach { case (y, i) =>
        Dml.applyTimeTravelBatch(spark, root, i + 1,
          Dml.mergePrunedBatch(base, y))
      }
      val last = Dml.TimeTravelYears.size
      val before2 = readV(root, last - 1)
      val before3 = readV(root, last)
      Dml.vacuumTimeTravel(root, retain = 2)
      assert(Dml.timeTravelVersions(root) == Seq(last - 1, last),
        "retention kept the wrong versions")
      // dropped versions are unreadable
      intercept[IllegalArgumentException](Dml.readVersionAsOf(spark, root, 0))
      // retained versions read byte-identically
      assert(readV(root, last - 1) == before2, "retained v2 changed")
      assert(readV(root, last) == before3, "retained v3 changed")
      // reclaimed exactly the dirs no retained manifest references:
      // g0's copies of the first two touched years (superseded before
      // v2) are gone; every dir a retained manifest names survives
      val y1 = Dml.TimeTravelYears(0)
      val y2 = Dml.TimeTravelYears(1)
      assert(!new java.io.File(s"$root/data/g0/yr=$y1").exists(),
        s"unreferenced g0/yr=$y1 not reclaimed")
      assert(!new java.io.File(s"$root/data/g0/yr=$y2").exists(),
        s"unreferenced g0/yr=$y2 not reclaimed")
      val referenced = Seq(last - 1, last)
        .flatMap(k => Dml.readManifest(root, k).values).toSet
      referenced.foreach { d =>
        assert(new java.io.File(s"$root/$d").exists(),
          s"referenced dir $d was deleted")
      }
    } finally graft.plans.Scratch.deleteTree(root)
  }

  test("shallow clone: v0 serves the source's latest bytes with zero " +
    "copy, and divergence never touches the source") {
    val src = Dml.timeTravelRoot(spark, TestSpark.Sf)
    def srcFiles(): Seq[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(src))
        .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
    }
    val before = srcFiles()
    val srcLatest = readV(src, Dml.timeTravelVersions(src).max)
    // building cloneRoot clones AND applies the divergent batch
    val clone = Dml.cloneRoot(spark, TestSpark.Sf)
    // v0 of the clone IS the source's latest state (served through
    // absolute pointer entries, no data under the clone at version 0)
    assert(readV(clone, 0) == srcLatest, "clone v0 diverged from source")
    // the diverged clone differs from the source exactly on the batch
    val cloneLatest = readV(clone, Dml.timeTravelVersions(clone).max)
    assert(cloneLatest != srcLatest, "clone batch was a no-op")
    assert(cloneLatest.size == srcLatest.size, "clone batch changed keys")
    // and the source tree is byte-for-byte what it was before the clone
    assert(srcFiles() == before, "clone mutated the source table")
    // the clone's own generation holds ONLY the touched partition
    val g1 = new java.io.File(s"$clone/data/g1")
    assert(g1.exists() &&
      g1.listFiles().filter(_.isDirectory).map(_.getName).toSeq ==
        Seq(s"yr=${Dml.TimeTravelYears(1)}"),
      "clone generation not partition-pruned")
  }

  test("timestamp resolution: at-or-before rule, latest after the " +
    "last commit, error before the first") {
    val root = Dml.timeTravelRoot(spark, TestSpark.Sf)
    val latest = Dml.timeTravelVersions(root).max
    // an instant exactly ON a commit resolves to that commit
    (0 to latest).foreach { k =>
      assert(Dml.resolveAsOfTimestamp(root, Dml.commitDate(k)) == k)
    }
    // between commits k and k+1 → k
    assert(Dml.resolveAsOfTimestamp(root,
      Dml.commitDate(latest - 1)) == latest - 1)
    // far in the future → latest
    assert(Dml.resolveAsOfTimestamp(root,
      Dml.commitDate(latest).plusYears(1)) == latest)
    // before the first commit → error (Delta's rule)
    intercept[IllegalArgumentException] {
      Dml.resolveAsOfTimestamp(root, Dml.commitDate(0).minusDays(1))
    }
    // the timestamp entry serves bytes identical to the by-version read
    val byTs = Dml.dmlTimeTravelAsOfTs.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val byK = Dml.dmlTimeTravel.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(byTs.nonEmpty && byTs == byK,
      "AS OF TIMESTAMP diverged from VERSION AS OF")
    // and history's partition counts reflect the actual manifests
    val hist = Dml.dmlTableHistory.run(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(3)).toMap
    assert(hist.keySet == (0 to latest).toSet)
    hist.foreach { case (k, np) =>
      assert(np == Dml.readManifest(root, k).size.toLong)
    }
  }

  test("deletion vectors: deletes are sidecar-sized and never touch " +
    "data files; compaction folds them invisibly") {
    def inventory(p: String): Seq[(String, Long, Long, String)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map { f =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
          (f.getPath, f.length(), f.lastModified(), md5)
        }.sortBy(_._1)
    }
    // the delete-side witness on a private tree: writing a sidecar
    // leaves every data file byte-identical (the DV mechanism itself)
    val priv = java.nio.file.Files.createTempDirectory("graft-dv-spec")
      .toString
    try {
      val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
      base.write.partitionBy("yr").parquet(s"$priv/data")
      val before = inventory(s"$priv/data")
      base.filter(col("o_orderkey") % 20 === Dml.DvMods.head)
        .select(col("o_orderkey")).write.parquet(s"$priv/dv/b0")
      assert(inventory(s"$priv/data") == before,
        "a DV delete touched the data files")
    } finally graft.plans.Scratch.deleteTree(priv)
    // the served root: reads mutate nothing, sidecars are delete-sized
    val root = Dml.dvRoot(spark, TestSpark.Sf)
    val dataBefore = inventory(s"$root/data")
    val served = Dml.dmlDeletionVectors.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(inventory(s"$root/data") == dataBefore,
      "merge-on-read scan rewrote data files")
    assert(!served.exists(r => Dml.DvMods.contains((r._1 % 20).toInt)),
      "a deleted key survived the DV anti-join")
    val dataBytes = dataBefore.map(_._2).sum
    val dvBytes = inventory(s"$root/dv").map(_._2).sum
    assert(dvBytes > 0 && dvBytes < dataBytes / 5,
      s"sidecars not delete-sized: $dvBytes vs data $dataBytes")
    // compaction: bit-equal read, sidecars gone, deleted rows physical
    val compacted = Dml.dmlDvCompaction.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(compacted == served,
      "DV compaction changed the served result")
    val croot = Dml.dvCompactRoot(spark, TestSpark.Sf)
    assert(!new java.io.File(s"$croot/dv").exists(),
      "compaction kept sidecars")
    assert(spark.read.parquet(s"$croot/data").count() == served.length,
      "compacted data row count != served rows")
  }

  test("DV-versioned lineage: time travel across a DV-only commit, " +
    "compaction invisible, OCC scope = its partitions, vacuum reclaims " +
    "the folded sidecar") {
    val root = Dml.dvVersionedRoot(spark, TestSpark.Sf)
    def readDv(k: Int): Seq[(Long, Long, Int)] =
      Dml.readVersionWithDv(spark, root, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
    // v1 reads PRE-delete (exactly the 1-batch replay); v2 = v1 minus
    // the tombstoned slice; v3 (compacted) ≡ v2
    val v1 = readDv(1)
    assert(v1 == replay(1), "v1 through the DV reader diverged")
    val v2 = readDv(2)
    val expected = v1.filterNot(r =>
      Dml.DvVersionedYears.contains(r._3) &&
        r._1 % 20 == Dml.DvVersionedMod)
    assert(v2 == expected, "v2 != v1 minus the DV slice")
    assert(v2.size < v1.size, "the DV commit deleted nothing")
    assert(readDv(3) == v2, "compaction changed the served state")
    // the DV-only commit repointed NO data dir — only dv lists grew;
    // its manifest diff names exactly its partitions (the OCC scope)
    val m1 = Dml.readManifestFull(root, 1)
    val m2 = Dml.readManifestFull(root, 2)
    assert(m1.keySet == m2.keySet)
    val changed = m1.keySet.filter(y => m1(y) != m2(y))
    assert(changed == Dml.DvVersionedYears.toSet,
      s"DV commit diff $changed != ${Dml.DvVersionedYears.toSet}")
    m2.foreach { case (y, e) =>
      assert(e.data == m1(y).data, s"DV commit repointed data of $y")
      if (Dml.DvVersionedYears.contains(y))
        assert(e.dvs == Seq(s"dv/g2/yr=$y"), s"year $y missing sidecar")
      else assert(e.dvs.isEmpty)
    }
    // v3 folded the sidecars: fresh data dirs, empty dv lists
    val m3 = Dml.readManifestFull(root, 3)
    Dml.DvVersionedYears.foreach { y =>
      assert(m3(y).data == s"data/g3/yr=$y" && m3(y).dvs.isEmpty,
        s"compaction did not fold year $y")
    }
    // sidecars are delete-sized relative to their partitions' data
    Dml.DvVersionedYears.foreach { y =>
      val dvRows = spark.read.parquet(s"$root/dv/g2/yr=$y").count()
      val dataRows = spark.read.parquet(
        Dml.resolveDir(root, m2(y).data)).count()
      assert(dvRows > 0 && dvRows < dataRows / 5,
        s"year $y sidecar not delete-sized: $dvRows of $dataRows")
    }
    // vacuum on a PRIVATE tree: retaining only the compacted head
    // reclaims the folded sidecar generation (the GDPR completion)
    val priv = Dml.buildDvVersionedTree(spark, TestSpark.Sf)
    try {
      val head = Dml.timeTravelVersions(priv).max
      val before = Dml.readVersionWithDv(spark, priv, head)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
      Dml.vacuumTimeTravel(priv, retain = 1)
      assert(!new java.io.File(s"$priv/dv/g2").exists() ||
        Option(new java.io.File(s"$priv/dv/g2").listFiles())
          .toSeq.flatten.isEmpty,
        "vacuum kept the folded DV sidecars")
      val after = Dml.readVersionWithDv(spark, priv, head)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
      assert(after == before, "vacuum changed the head read")
    } finally graft.plans.Scratch.deleteTree(priv)
  }

  test("plain VERSION AS OF honors DV sidecars, and the change feed " +
    "across a DV-only commit emits exactly the tombstoned keys") {
    val root = Dml.dvVersionedRoot(spark, TestSpark.Sf)
    // readVersionAsOf (the generic entry point) must apply the v2
    // entries' sidecars — a data-dir-only read here would resurrect
    // the deleted rows (the r17 composition gap)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
      df.select(col("o_orderkey"), col("cents"), col("yr"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
    val asOf = rows(Dml.readVersionAsOf(spark, root, 2))
    assert(asOf == rows(Dml.readVersionWithDv(spark, root, 2)),
      "VERSION AS OF diverged from the DV-applying read on a DV commit")
    assert(!asOf.exists(r => Dml.DvVersionedYears.contains(r._3) &&
        r._1 % 20 == Dml.DvVersionedMod),
      "VERSION AS OF resurrected DV-tombstoned rows")
    // feed v1 → v2: data dirs byte-identical, only sidecar lists
    // changed — the full-entry diff must surface the deletes
    val feed = Dml.versionChanges(spark, root, 2).collect()
    assert(feed.nonEmpty, "CDF across the DV-only commit emitted zero rows")
    assert(feed.forall(_.getString(1) == "delete"),
      "DV-only commit produced non-delete change rows")
    val keys = feed.map(_.getLong(2)).toSet
    val expect = rows(Dml.readVersionWithDv(spark, root, 1))
      .filter(r => Dml.DvVersionedYears.contains(r._3) &&
        r._1 % 20 == Dml.DvVersionedMod)
      .map(_._1).toSet
    assert(keys == expect,
      s"feed keys ${keys.size} != tombstone slice ${expect.size}")
  }

  test("restore of a DV-carrying version keeps its sidecar lists " +
    "(metadata-only, deletes stay deleted)") {
    // private tree: restore mutates its lineage
    val priv = Dml.buildDvVersionedTree(spark, TestSpark.Sf)
    try {
      val restored = Dml.restoreVersion(priv, 2)
      assert(Dml.readManifestFull(priv, restored) ==
        Dml.readManifestFull(priv, 2),
        "restore dropped entry components (dvs/deltas)")
      val rows = Dml.readVersionAsOf(spark, priv, restored)
        .collect().map(r => (r.getLong(0), r.getInt(2)))
      assert(!rows.exists(r => Dml.DvVersionedYears.contains(r._2) &&
          r._1 % 20 == Dml.DvVersionedMod),
        "restore to the DV version resurrected tombstoned rows")
    } finally graft.plans.Scratch.deleteTree(priv)
  }

  test("merge-on-read MERGE: O(batch) commits never rewrite a " +
    "pre-existing file, stacked commits replay exactly, compaction " +
    "folds invisibly, and a DV delete folds the delta layers") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-morspec").toString
    try {
      val base = Dml.mergePrunedBase(spark, TestSpark.Sf)
      base.write.partitionBy("yr").parquet(s"$root/data/g0")
      val years = base.select(col("yr")).distinct()
        .collect().map(_.getInt(0)).sorted
      Dml.writeManifestFull(root, 0,
        years.map(y => y -> Dml.PartEntry(s"data/g0/yr=$y", Nil)).toMap)
      def inv(): Set[(String, Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(root))
          .filter(f => !f.getName.startsWith("_") &&
            !f.getName.startsWith(".") && !f.getPath.contains("/manifests/"))
          .map(f => (f.getPath, f.length(), f.lastModified())).toSet
      }
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
        df.select(col("o_orderkey"), col("cents"), col("yr"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSeq.sorted
      val before = inv()
      val y1 = Dml.TimeTravelYears.head
      val b1 = Dml.mergePrunedBatch(base, y1)
      Dml.applyMergeMoR(spark, root, 1, b1)
      val after1 = inv()
      assert(before.subsetOf(after1),
        "a MoR commit rewrote a pre-existing data file")
      val fresh = (after1 -- before).map(_._1)
      assert(fresh.nonEmpty && fresh.forall(pth =>
          pth.contains("/dv/g1/") || pth.contains("/delta/g1/")),
        s"MoR commit wrote outside dv/delta: $fresh")
      // commit-size contract: the sidecar pair is batch-sized
      val nb = b1.count()
      assert(spark.read.parquet(s"$root/dv/g1/yr=$y1").count() == nb)
      assert(spark.read.parquet(s"$root/delta/g1/yr=$y1").count() == nb)
      // stacked commit on the SAME partition, updating keys that live
      // ONLY in the v1 delta layer (the minted negative keys) — the
      // fold must keep exactly one version of each key
      val b2 = b1.select(col("o_orderkey"),
        (col("cents") + 11).as("cents"), col("yr"))
      Dml.applyMergeMoR(spark, root, 2, b2)
      val got = rows(Dml.readVersionWithDv(spark, root, 2))
      val expect = rows(base
        .join(b2.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
        .unionByName(b2))
      assert(got == expect,
        "stacked MoR commits diverged from the sequential replay")
      assert(before.subsetOf(inv()), "v2 touched a pre-existing file")
      // compaction folds invisibly and empties the sidecar lists
      Dml.applyDvCompaction(spark, root, 3)
      assert(rows(Dml.readVersionWithDv(spark, root, 3)) == got,
        "MoR compaction changed the visible state")
      assert(Dml.readManifestFull(root, 3).values
          .forall(e => e.dvs.isEmpty && e.deltas.isEmpty),
        "compaction left sidecar references")
      // a DV-only delete on a delta-carrying entry folds the layers:
      // the minted keys live only in v4's delta and must die
      Dml.applyMergeMoR(spark, root, 4, b1)
      Dml.applyDvDelete(spark, root, 5, Seq(y1), col("o_orderkey") < 0)
      val v5 = rows(Dml.readVersionWithDv(spark, root, 5))
      assert(v5.nonEmpty && !v5.exists(_._1 < 0),
        "DV delete left delta-layer rows alive")
      // and the feed across the MoR commit is non-empty (full-entry diff)
      assert(Dml.versionChanges(spark, root, 1).limit(1).count() == 1,
        "CDF across a MoR commit emitted zero rows")
      // vacuum reclaims the folded sidecars: retain only the head (v5);
      // v1-v4's dv/delta generations fall out of every retained
      // manifest... except those v5 still references (v4's pair + v5's
      // dv — v5 appended to v4's entry). Unreferenced ones go.
      val headBefore = rows(Dml.readVersionWithDv(spark, root, 5))
      Dml.vacuumTimeTravel(root, 1)
      val kept = Dml.readManifestFull(root, 5).values
        .flatMap(e => e.data +: (e.dvs ++ e.deltas)).toSet
      // the sweep reclaims at PARTITION-dir granularity (empty
      // generation shells may remain): every surviving partition dir
      // must be referenced by the retained manifest
      for (sub <- Seq("dv", "delta");
           g <- Option(new java.io.File(s"$root/$sub").listFiles())
             .toSeq.flatten.filter(_.isDirectory);
           pd <- Option(g.listFiles()).toSeq.flatten.filter(_.isDirectory))
        assert(kept.contains(s"$sub/${g.getName}/${pd.getName}"),
          s"vacuum left unreferenced $sub/${g.getName}/${pd.getName}")
      assert(rows(Dml.readVersionWithDv(spark, root, 5)) == headBefore,
        "vacuum changed the retained MoR head read")
    } finally graft.plans.Scratch.deleteTree(root)
  }

  test("versioned schema evolution: ADD COLUMN is metadata-only, and " +
    "each version serves under its own schema") {
    val root = Dml.schemaEvoRoot(spark, TestSpark.Sf)
    // metadata-only: v1's entries are v0's verbatim (no data written
    // for the evolution commit) and only the schema header differs
    assert(Dml.readManifestFull(root, 1) == Dml.readManifestFull(root, 0),
      "ADD COLUMN commit changed partition entries")
    assert(Dml.readManifestSchema(root, 0).get == Dml.SchemaV0)
    assert(Dml.readManifestSchema(root, 1).get == Dml.SchemaV1)
    assert(!new java.io.File(s"$root/data/g1").exists(),
      "ADD COLUMN commit wrote a data generation")
    // v0 serves WITHOUT the column
    val v0 = Dml.readVersionWithSchema(spark, root, 0)
    assert(!v0.columns.contains("note"),
      "v0 read leaked the post-evolution column")
    // v1 serves it all-NULL over the same rows
    val v1 = Dml.readVersionWithSchema(spark, root, 1)
    assert(v1.columns.contains("note"))
    assert(v1.filter(col("note").isNotNull).limit(1).count() == 0,
      "pre-evolution generations served non-NULL note values")
    assert(v1.count() == v0.count(), "ADD COLUMN changed the row set")
    // v2: exactly the batch rows carry values, old generations NULL
    val v2 = Dml.readVersionWithSchema(spark, root, 2)
    val withNote = v2.filter(col("note").isNotNull)
    val batch = Dml.schemaEvoBatch(
      Dml.mergePrunedBase(spark, TestSpark.Sf), Dml.TimeTravelYears.head)
    assert(withNote.count() == batch.count(),
      "note values did not match the batch row set")
    assert(v2.filter(col("yr") =!= Dml.TimeTravelYears.head)
        .filter(col("note").isNotNull).limit(1).count() == 0,
      "an untouched partition served note values")
    // v3 DROP COLUMN: metadata-only (entries verbatim), the reverted
    // schema hides the physically-present g2 column, and v2 time
    // travel still serves it
    assert(Dml.readManifestFull(root, 3) == Dml.readManifestFull(root, 2),
      "DROP COLUMN commit changed partition entries")
    assert(Dml.readManifestSchema(root, 3).get == Dml.SchemaV0)
    val v3 = Dml.readVersionWithSchema(spark, root, 3)
    assert(!v3.columns.contains("note"),
      "v3 read still serves the dropped column")
    assert(v3.count() == v2.count(), "DROP COLUMN changed the row set")
    assert(Dml.readVersionWithSchema(spark, root, 2)
        .filter(col("note").isNotNull).limit(1).count() == 1,
      "time travel across the drop lost the column values")
  }

  test("MoR CDC: a DELETE is pure DV membership — the partition's data " +
    "dir survives from g0, deleted keys never enter the delta") {
    val root = Dml.morCdcRoot(spark, TestSpark.Sf)
    val e = Dml.readManifestFull(root, 1)(Dml.TimeTravelYears.head)
    assert(e.data.contains("g0"),
      "the MoR CDC commit rewrote its partition's data dir")
    assert(e.dvs.nonEmpty && e.deltas.nonEmpty, "missing sidecar pair")
    val dv = spark.read.parquet(s"$root/${e.dvs.head}")
      .collect().map(_.getLong(0)).toSet
    assert(dv.exists(k => k >= 0 && k % 20 == 5),
      "deleted slice missing from the DV sidecar")
    val delta = spark.read.parquet(s"$root/${e.deltas.head}")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    assert(!delta.exists(k => k >= 0 && k % 20 == 5),
      "a deleted key survived into the delta")
    // the visible read drops the deleted slice for the touched year
    val y = Dml.TimeTravelYears.head
    val gone = Dml.readVersionWithDv(spark, root, 1)
      .filter(col("yr") === y && col("o_orderkey") >= 0 &&
        col("o_orderkey") % 20 === 5)
    assert(gone.limit(1).count() == 0, "deleted rows still visible")
  }
}
