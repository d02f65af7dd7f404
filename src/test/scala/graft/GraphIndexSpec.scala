package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Stored NSW-graph lifecycle: persist / incremental insert / tombstone
  * delete. The oracle hash-verifies each entry's VALUES; these specs pin
  * the lifecycle CONTRACTS the values alone don't show — serving from
  * the store is bit-equal to serving in memory, an incremental insert
  * never touches the frozen artifact's files, and a delete both empties
  * the tombstone set from results and keeps k full. */
class GraphIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select(col("query_id"), col("neighbor_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  /** (name, length, mtime, md5) per file under a stored edge table —
    * the frozen-artifact witness (same discipline as MergePrunedSpec,
    * plus a CONTENT hash: filesystem mtime granularity can be a full
    * second, so a same-name same-size rewrite landing inside the
    * original timestamp's window would otherwise pass "untouched"
    * undetected; spec-scale files are small enough to hash whole). */
  private def inventory(root: String): Seq[(String, Long, Long, String)] =
    Option(new java.io.File(s"$root/edges").listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map { f =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
        (f.getName, f.length(), f.lastModified(), md5)
      }
      .sortBy(_._1)

  test("served-from-store is bit-equal to the in-memory walk") {
    val fromStore = rows(Similarity.annGraphPersist.run(spark, TestSpark.Sf))
    val inMemory = rows(
      Similarity.graphBeamTopK(spark, TestSpark.Sf, Similarity.TopK))
    assert(fromStore.nonEmpty)
    assert(fromStore == inMemory, "stored-graph serving diverged")
  }

  test("incremental insert leaves the frozen base graph untouched " +
    "and makes the batch reachable") {
    // force the base build, snapshot its files, then run the insert+serve
    val root = Similarity.graphBaseRoot(spark, TestSpark.Sf)
    val before = inventory(root)
    assert(before.nonEmpty, "base graph artifact missing")
    val served = rows(
      Similarity.annGraphIncremental.run(spark, TestSpark.Sf))
    assert(inventory(root) == before,
      "incremental insert rewrote the frozen base graph files")
    // inserted nodes are servable: some top-k neighbor comes from the
    // batch slice (true at every fixture scale — 15/16/35 of 100)
    assert(served.exists(_._2 % 10 == Similarity.AnnBatchMod),
      "no batch node reachable after insert")
    // and every query still gets the full k
    served.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.size == Similarity.TopK, s"query $q served ${rs.size} rows")
    }
  }

  test("tombstone delete: no tombstoned neighbor served, k stays full, " +
    "stored artifact untouched") {
    val root = Similarity.graphIndexRoot(spark, TestSpark.Sf)
    val before = inventory(root)
    val served = rows(Similarity.annGraphDelete.run(spark, TestSpark.Sf))
    assert(inventory(root) == before,
      "delete rewrote the stored graph files")
    assert(!served.exists(_._2 % 7 == Similarity.AnnDeleteMod),
      "tombstoned neighbor served")
    served.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.size == Similarity.TopK, s"query $q served ${rs.size} rows")
    }
  }

  test("two-layer persist: stored-artifact serve is bit-equal to the " +
    "memoized layered walk, files frozen, both layers + routing shipped") {
    val root = Similarity.hnswIndexRoot(spark, TestSpark.Sf)
    // the artifact ships BOTH layers and the routing entries
    def files(sub: String): Seq[(String, Long, Long, String)] =
      Option(new java.io.File(s"$root/$sub").listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map { f =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
          (f.getName, f.length(), f.lastModified(), md5)
        }.sortBy(_._1)
    val before = Seq("edges0", "edges1", "entries1").map(files)
    assert(before.forall(_.nonEmpty), "a layer of the artifact is missing")
    // the upper layer is the sparse one: only layer-1 nodes appear
    val l1nodes = spark.read.parquet(s"$root/edges1")
      .select(col("src")).distinct().collect().map(_.getLong(0))
    assert(l1nodes.nonEmpty &&
      l1nodes.forall(_ % Similarity.LayerMod == 0),
      "upper-layer edge table contains non-layer-1 nodes")
    val entries = spark.read.parquet(s"$root/entries1")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(entries == Similarity.L1Entries.sorted,
      s"stored routing entries $entries != ${Similarity.L1Entries}")
    val fromStore = rows(Similarity.annHnswPersist.run(spark, TestSpark.Sf))
    assert(Seq("edges0", "edges1", "entries1").map(files) == before,
      "serve rewrote the stored two-layer artifact")
    val inMemory = rows(
      Similarity.hnswLayeredTopK(spark, TestSpark.Sf, Similarity.TopK))
    assert(fromStore.nonEmpty && fromStore == inMemory,
      "stored two-layer serving diverged from the memoized walk")
  }

  test("two-layer incremental: frozen base untouched, both layers " +
    "gain links, batch nodes become servable") {
    val root = Similarity.hnswBaseRoot(spark, TestSpark.Sf)
    def files(sub: String): Seq[(String, Long, Long, String)] =
      Option(new java.io.File(s"$root/$sub").listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map { f =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
          (f.getName, f.length(), f.lastModified(), md5)
        }.sortBy(_._1)
    val before = Seq("edges0", "edges1", "entries1").map(files)
    assert(before.forall(_.nonEmpty), "base two-layer artifact missing")
    val served = rows(Similarity.annHnswIncremental.run(spark, TestSpark.Sf))
    assert(Seq("edges0", "edges1", "entries1").map(files) == before,
      "hierarchical insert rewrote the frozen base artifact")
    assert(served.nonEmpty)
    // the insert exercised BOTH layers: L0 links for every batch node,
    // L1 links for the layer-eligible subset (vec_id ≡ 8 mod 40)
    val links = Similarity.hnswIncrEdges(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byLayer = links.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byLayer.getOrElse(0, 0) > 0 && byLayer.getOrElse(1, 0) > 0,
      s"expected links on both layers, got $byLayer")
    assert(links.filter(_._3 == 1).forall(l =>
      l._1 % Similarity.LayerMod == 0 && l._1 % 10 == Similarity.HnswBatchMod),
      "an upper-layer link came from a non-eligible node")
    // inserted nodes are reachable through the serve
    assert(served.exists(_._2 % 10 == Similarity.HnswBatchMod),
      "no batch node served — frozen-graph insert unreachable")
  }

  test("two-layer delete + compaction: tombstones honored on BOTH " +
    "layers, compact serves bit-equal, both edge tables shrink, full " +
    "artifact untouched") {
    val full = Similarity.hnswIndexRoot(spark, TestSpark.Sf)
    def files(root: String, sub: String): Seq[(String, Long, Long, String)] =
      Option(new java.io.File(s"$root/$sub").listFiles()).toSeq.flatten
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map { f =>
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
          (f.getName, f.length(), f.lastModified(), md5)
        }.sortBy(_._1)
    val before = Seq("edges0", "edges1", "entries1").map(files(full, _))
    val del = rows(Similarity.annHnswDelete.run(spark, TestSpark.Sf))
    assert(Seq("edges0", "edges1", "entries1").map(files(full, _)) == before,
      "two-layer tombstone delete rewrote the stored artifact")
    assert(del.nonEmpty)
    assert(!del.exists(_._2 % 7 == Similarity.AnnDeleteMod),
      "tombstoned neighbor served through the layered walk")
    del.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.size == Similarity.TopK, s"query $q served ${rs.size} rows")
    }
    val comp = rows(Similarity.annHnswCompact.run(spark, TestSpark.Sf))
    assert(comp == del,
      "two-layer compact-then-serve diverged from tombstone serve")
    // BOTH layers' rewrites dropped exactly the tombstone-touching
    // edges, and the routing entries survive tombstone-free
    val croot = Similarity.hnswCompactRoot(spark, TestSpark.Sf)
    Seq("edges0", "edges1").foreach { t =>
      val orig = spark.read.parquet(s"$full/$t")
      val kept = spark.read.parquet(s"$croot/$t")
      val expect = orig
        .filter(col("src") % 7 =!= Similarity.AnnDeleteMod &&
          col("dst") % 7 =!= Similarity.AnnDeleteMod)
        .count()
      assert(kept.count() == expect,
        s"$t compacted count ${kept.count()} != filtered $expect")
      assert(expect < orig.count(), s"$t compaction reclaimed nothing")
    }
    val entries = spark.read.parquet(s"$croot/entries1")
      .collect().map(_.getLong(0))
    assert(entries.nonEmpty &&
      entries.forall(_ % 7 != Similarity.AnnDeleteMod))
    // entry 24 (≡ 3 mod 7) was itself tombstoned out of the routing set
    assert(!entries.contains(24L) &&
      entries.length < Similarity.L1Entries.length,
      "tombstoned routing entry survived compaction")
  }

  test("graph compaction: physical delete serves bit-equal to " +
    "tombstone-filtered serving and shrinks the stored edge table") {
    val del = rows(Similarity.annGraphDelete.run(spark, TestSpark.Sf))
    val comp = rows(Similarity.annGraphCompact.run(spark, TestSpark.Sf))
    assert(comp.nonEmpty)
    assert(comp == del, "compact-then-serve diverged from tombstone serve")
    assert(!comp.exists(_._2 % 7 == Similarity.AnnDeleteMod),
      "tombstoned neighbor served from the compacted graph")
    // the rewrite dropped EXACTLY the tombstone-touching edges
    val full = spark.read.parquet(
      s"${Similarity.graphIndexRoot(spark, TestSpark.Sf)}/edges")
    val compacted = spark.read.parquet(
      s"${Similarity.graphCompactRoot(spark, TestSpark.Sf)}/edges")
    val expect = full
      .filter(col("src") % 7 =!= Similarity.AnnDeleteMod &&
        col("dst") % 7 =!= Similarity.AnnDeleteMod)
      .count()
    assert(compacted.count() == expect,
      s"compacted edge count ${compacted.count()} != filtered $expect")
    assert(expect < full.count(), "compaction reclaimed nothing")
    // the stored entry list survives tombstone-free and non-empty
    val entries = spark.read.parquet(
      s"${Similarity.graphCompactRoot(spark, TestSpark.Sf)}/entries")
      .collect().map(_.getLong(0))
    assert(entries.nonEmpty &&
      entries.forall(_ % 7 != Similarity.AnnDeleteMod))
  }

  test("HNSW lifecycle CHAIN: tombstoned base -> insert -> compact " +
    "composes — no dead endpoint anywhere, inserted links present, " +
    "base artifact untouched") {
    def walk(root: String): Seq[(String, Long, Long)] = {
      def w(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(w)
        else Seq(f)
      w(new java.io.File(root))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
    }
    val base = Similarity.hnswBaseRoot(spark, TestSpark.Sf)
    val baseBefore = walk(base)
    val chain = Similarity.hnswChainRoot(spark, TestSpark.Sf)
    assert(walk(base) == baseBefore,
      "the chain build rewrote the frozen base artifact")
    for (t <- Seq("edges0", "edges1")) {
      val ends = spark.read.parquet(s"$chain/$t")
        .select(col("src"), col("dst")).collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      assert(ends.nonEmpty &&
        !ends.exists(_ % 7 == Similarity.AnnDeleteMod),
        s"$t carries a tombstoned endpoint after the chained compact")
    }
    val entries = spark.read.parquet(s"$chain/entries1")
      .collect().map(_.getLong(0))
    assert(entries.nonEmpty &&
      entries.forall(_ % 7 != Similarity.AnnDeleteMod),
      "a tombstoned routing entry survived the chain")
    // inserted links present: some edge endpoint is a live batch node
    val batchSrc = spark.read.parquet(s"$chain/edges0")
      .filter(col("src") % 10 === Similarity.HnswBatchMod &&
        col("src") % 7 =!= Similarity.AnnDeleteMod)
    assert(batchSrc.limit(1).count() == 1,
      "no inserted batch links in the chained artifact")
    // and the serve returns full k for every query
    val served = Similarity.annHnswLifecycleChain.run(spark, TestSpark.Sf)
      .collect()
    assert(served.length == Similarity.NumQueries * Similarity.TopK,
      s"chained serve starved k: ${served.length} rows")
  }
}
