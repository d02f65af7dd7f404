package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, UserActivity}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
  }

  test("hourly windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:55:00"), 2, "click", 2.0),
      Event(3, ts("2024-01-01 01:10:00"), 1, "view", 3.0))
    val q = EventsStream.hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append())
      .start()
    in.addData(Event(4, ts("2024-01-01 03:30:00"), 3, "click", 4.0)) // advances watermark past 01:xx
    runToCompletion(q)
    val rows = spark.table("hourly")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 01:00:00.0", "view", 1L, 3.0)))
  }

  test("session_window merges events within the gap, splits beyond it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
      Event(2, ts("2024-01-01 00:05:00"), 7, "click", 2.0),   // same session
      Event(3, ts("2024-01-01 00:30:00"), 7, "click", 3.0))   // new session (>10 min gap)
    val q = EventsStream.sessions(in.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append())
      .start()
    in.addData(Event(4, ts("2024-01-01 05:00:00"), 8, "view", 0.0)) // advance watermark
    runToCompletion(q)
    val rows = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3)))
      .toSet
    assert(rows.contains((7L, "2024-01-01 00:00:00.0", 2L)))
    assert(rows.contains((7L, "2024-01-01 00:30:00.0", 1L)))
  }

  test("mapGroupsWithState accumulates per-user activity across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventsStream.runningUserActivity(in.toDS())
      .writeStream.format("memory").queryName("activity")
      .outputMode(OutputMode.Update())
      .start()
    in.addData(Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.5))
    q.processAllAvailable()
    in.addData(Event(2, ts("2024-01-01 00:01:00"), 1, "click", 2.5))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("activity").collect()
      .map(r => UserActivity(r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_.user_id == 1L)
    assert(last.exists(a => a.n_events == 2L && math.abs(a.total_value - 4.0) < 1e-12))
  }

  test("flatMapGroupsWithState emits one alert per threshold crossing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventsStream.valueAlerts(in.toDS(), step = 10.0)
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append())
      .start()
    in.addData(Event(1, ts("2024-01-01 00:00:00"), 1, "click", 7.0))
    q.processAllAvailable() // total 7 → no alert
    in.addData(Event(2, ts("2024-01-01 00:01:00"), 1, "click", 25.0))
    q.processAllAvailable() // total 32 → crossings at 10, 20, 30
    in.addData(Event(3, ts("2024-01-01 00:02:00"), 2, "click", 11.0))
    q.processAllAvailable() // user 2 crosses 10
    q.stop()
    val alerts = spark.table("alerts").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(alerts == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)))
  }

  test("file sink: windowed counts stream to parquet and read back") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = "/tmp/graft-stream-sink"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:10:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 02:00:00"), 2, "view", 0.0)) // advances watermark
    val q = EventsStream.hourlyCounts(in.toDF())
      .writeStream.format("parquet")
      .option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append())
      .start()
    runToCompletion(q)
    val rows = spark.read.parquet(s"$dir/data")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("click", 2L)))
  }

  test("foreachBatch: per-batch sink sees each micro-batch exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (batchId, rows)
    val q = in.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized { seen += ((id, batch.count())) }
        ()
      }
      .outputMode(OutputMode.Append())
      .start()
    in.addData(Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    in.addData(
      Event(2, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Event(3, ts("2024-01-01 00:02:00"), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    assert(seen.map(_._2).sum == 3)
    assert(seen.map(_._1).distinct.size == seen.size)
  }

  test("stream-stream interval join matches the batch range join") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = Seq(
      Event(1, ts("2024-01-01 00:00:00"), 1, "view", 0.0),
      Event(2, ts("2024-01-01 00:04:00"), 1, "purchase", 9.0), // joins view 1
      Event(3, ts("2024-01-01 00:20:00"), 1, "purchase", 9.0), // outside 10 min
      Event(4, ts("2024-01-01 00:19:00"), 2, "view", 0.0),
      Event(5, ts("2024-01-01 00:21:00"), 2, "purchase", 9.0)) // joins view 4
    val vIn = MemoryStream[Event]
    val pIn = MemoryStream[Event]
    vIn.addData(events.filter(_.event_type == "view"): _*)
    pIn.addData(events.filter(_.event_type == "purchase"): _*)
    val q = EventsStream.intervalJoin(vIn.toDF(), pIn.toDF(), 600L)
      .writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append())
      .start()
    // advance both watermarks past every event so results flush
    vIn.addData(Event(90, ts("2024-01-01 06:00:00"), 9, "view", 0.0))
    pIn.addData(Event(91, ts("2024-01-01 06:00:00"), 9, "purchase", 0.0))
    runToCompletion(q)
    val streamed = spark.table("ivj")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.Temporal.rangeJoin(
      events.toDF().filter($"event_type" === "view"),
      events.toDF().filter($"event_type" === "purchase"), 600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the flush sentinels (user 9, exact-ts pair) also join; drop them
    assert(streamed - ((9L, 90L, 91L)) == batch)
    assert(batch == Set((1L, 1L, 2L), (2L, 4L, 5L)))
  }

  test("streaming dedup drops same-fingerprint docs within the watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = EventsStream.dedupStream(
      in.toDF().toDF("doc_id", "ts", "text"))
      .select("doc_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append())
      .start()
    in.addData(
      (1L, ts("2024-01-01 00:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 00:01:00"), "THE QUICK BROWN FOX"), // dup (lowercased fp)
      (3L, ts("2024-01-01 00:02:00"), "something else"))
    q.processAllAvailable()
    in.addData((4L, ts("2024-01-01 00:10:00"), "the quick brown fox")) // dup, later batch
    runToCompletion(q)
    val survivors = spark.table("sdedup").collect().map(_.getLong(0)).toSet
    assert(survivors.contains(3L))
    assert((survivors & Set(1L, 2L)).size == 1, s"one of the dups survives: $survivors")
    assert(!survivors.contains(4L), "cross-batch duplicate must be dropped")
  }

  test("streaming ingestion pipeline: dedup → quality gate → chunk") {
    // the composed continuous form of the corpus-prep path: exact dedup
    // within the watermark, a quality filter, then context-window
    // chunking — all on one unbounded stream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    import org.apache.spark.sql.functions.col
    val piped = graft.operators.Corpus.chunk(
      EventsStream.dedupStream(docs)
        .filter(graft.functions.Text.tokenCount(col("text")) >= 3),
      size = 4, stride = 3)
    val q = piped
      .writeStream.format("memory").queryName("ingest")
      .outputMode(OutputMode.Append())
      .start()
    in.addData(
      (1L, ts("2024-01-01 00:00:00"), "a b c d e f"),   // 2 chunks
      (2L, ts("2024-01-01 00:01:00"), "A B C D E F"),   // dup of 1 → dropped
      (3L, ts("2024-01-01 00:02:00"), "x y"))           // too short → dropped
    q.processAllAvailable()
    in.addData((4L, ts("2024-01-01 00:10:00"), "p q r s")) // 2 chunks (q r s tail)
    runToCompletion(q)
    val rows = spark.table("ingest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet.intersect(Set(1L, 2L)).size == 1, s"dedup failed: $rows")
    assert(!byDoc.contains(3L), "quality gate failed")
    assert(byDoc(4L).map(_._3) == Set("p q r s", "s"))
  }

  test("batch sessionize query matches its own streaming-safe definition") {
    val out = EventsStream.sessionizeEvents.run.apply(spark, TestSpark.Sf)
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq(
      "user_id", "session_start", "session_end", "n_events", "total_value"))
  }

  test("executed streaming agg (AvailableNow over fixture files) equals batch") {
    import org.apache.spark.sql.functions._
    val streamed = EventsStream.runHourlyCountsStream(spark, TestSpark.Sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val batch = EventsStream.hourlyCounts(
      Tables.df(spark, TestSpark.Sf, "events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("executed stream-stream interval join equals the batch range join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.df(spark, TestSpark.Sf, "events")
    val streamed = EventsStream.runIntervalJoinStream(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val batch = graft.operators.Temporal.rangeJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      graft.operators.Temporal.RangeWindowSec)
      .select(col("user_id"), col("v_event_id"), col("p_event_id"),
        col("gap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == batch)
  }

  test("custom DSv2 source drains under admission control in many batches") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_mbs_").toString
    val out = EventsStream.runRangeSourceStreamAt(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // final Complete state equals the one-shot aggregate: 100k rows
    assert(out.values.sum == 100000L)
    // offset log proves the drain took multiple admission-controlled
    // micro-batches (100000 / 16384 -> 7), not one big gulp
    val offsets = new java.io.File(s"$tmp/ckpt/offsets").listFiles()
      .count(!_.getName.startsWith("."))
    assert(offsets >= 7, s"expected >=7 micro-batches, saw $offsets")
  }

  test("restart against a committed checkpoint replays nothing (exactly-once)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_restart_").toString
    val first = EventsStream
      .runHourlyCountsStreamAt(spark, TestSpark.Sf, tmp)
      .collect().map(_.toString).sorted
    // sink files as written by run 1 (names + sizes)
    def sinkFiles() = {
      val d = new java.io.File(s"$tmp/out")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length)).sortBy(_._1).toSeq
    }
    val filesAfterFirst = sinkFiles()
    // restart: same checkpoint, same drained source — offsets are
    // committed, so AvailableNow must terminate without a new batch
    val second = EventsStream
      .runHourlyCountsStreamAt(spark, TestSpark.Sf, tmp)
      .collect().map(_.toString).sorted
    assert(second.toSeq == first.toSeq, "restart changed the result")
    assert(sinkFiles() == filesAfterFirst,
      "restart rewrote the sink — offsets were not honored")
  }

  // The HDFS-backed default provider keeps state on the JVM heap — a
  // 100 TB ingest runs RocksDB instead (bounded memory, spillable SST
  // state). Run every stateful access pattern once under each provider
  // and demand identical drained results, through the real runtime.
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[A](provider: Option[String])(f: => A): A = {
    val prev = spark.conf.getOption(ProviderKey)
    provider match {
      case Some(p) => spark.conf.set(ProviderKey, p)
      case None => spark.conf.unset(ProviderKey)
    }
    try f finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private val matrixNames = new java.util.concurrent.atomic.AtomicInteger

  /** Incremental mapGroupsWithState drive (two micro-batches, state
    * carried across them) — the cross-batch keyed-state path the batch
    * entry cannot exercise. Returns the Update-mode emission log. */
  private def driveActivityIncremental(): Seq[String] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val name = s"activity_matrix_${matrixNames.incrementAndGet()}"
    val in = MemoryStream[Event]
    val q = EventsStream.runningUserActivity(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .start()
    in.addData(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.5),
      Event(2, ts("2024-01-01 00:01:00"), 2, "view", 3.0))
    q.processAllAvailable()
    in.addData(
      Event(3, ts("2024-01-01 00:02:00"), 1, "click", 2.5),
      Event(4, ts("2024-01-01 00:03:00"), 3, "click", 0.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).collect().map(_.toString).sorted.toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  /** [[driveActivityIncremental]]'s twin on transformWithState: same
    * two micro-batches, same keys, Update-mode emission log. */
  private def driveActivityTwsIncremental(): Seq[String] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val name = s"activity_tws_${matrixNames.incrementAndGet()}"
    val in = MemoryStream[Event]
    val q = EventsStream.runningUserActivityTws(in.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .start()
    in.addData(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.5),
      Event(2, ts("2024-01-01 00:01:00"), 2, "view", 3.0))
    q.processAllAvailable()
    in.addData(
      Event(3, ts("2024-01-01 00:02:00"), 1, "click", 2.5),
      Event(4, ts("2024-01-01 00:03:00"), 3, "click", 0.5))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).collect().map(_.toString).sorted.toSeq
    spark.catalog.dropTempView(name)
    rows
  }

  test("transformWithState timers + multi-variable state: an event-time " +
      "timer closes the session, emitting both state variables") {
    withProvider(Some(RocksProvider)) {
      import spark.implicits._
      implicit val sq = spark.sqlContext
      val name = s"tws_timer_${matrixNames.incrementAndGet()}"
      val in = MemoryStream[Event]
      val q = EventsStream.timerSessions(in.toDS(), gapMs = 10000L)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update())
        .start()
      // batch 1: user 1's session (2 events, 60 s apart is ONE session
      // only because the timer re-arms on the second event)
      in.addData(
        Event(11, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(12, ts("2024-01-01 00:00:05"), 1, "view", 2.0))
      q.processAllAvailable()
      // batch 2 advances the watermark past user 1's timer
      // (00:00:15); its own timer (01:00:10) stays armed
      in.addData(Event(21, ts("2024-01-01 01:00:00"), 2, "click", 3.0))
      q.processAllAvailable()
      // batch 3: watermark (01:00:00 from batch 2) > user 1's expiry —
      // the timer fires HERE and emits the closed session
      in.addData(Event(31, ts("2024-01-01 02:00:00"), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table(name).as[EventsStream.SessionSummary]
        .collect().toSeq
      q.stop()
      spark.catalog.dropTempView(name)
      assert(rows.exists(r =>
        r.user_id == 1 && r.n_events == 2 && r.event_ids == Seq(11L, 12L)),
        s"user 1's timer-closed session missing or wrong: $rows")
      // user 3 arrived last — its timer cannot have fired yet
      assert(!rows.exists(_.user_id == 3),
        s"user 3's session closed before any watermark passed it: $rows")
      // input batches themselves emit nothing: every emission is a
      // timer expiry carrying BOTH state variables
      assert(rows.forall(r => r.n_events > 0 && r.event_ids.nonEmpty))
    }
  }

  test("transformWithState: cross-batch ValueState carries, and the " +
      "emission log equals mapGroupsWithState's on the same drive") {
    // the successor API must agree with the v1 stateful API on the
    // identical incremental workload; transformWithState REQUIRES the
    // RocksDB provider, so both run there (mapGroupsWithState's
    // default-vs-RocksDB agreement is the matrix test's job)
    val mgws = withProvider(Some(RocksProvider))(driveActivityIncremental())
    val tws = withProvider(Some(RocksProvider))(driveActivityTwsIncremental())
    assert(tws == mgws,
      s"transformWithState diverged from mapGroupsWithState:\n$tws\n$mgws")
    assert(tws.nonEmpty)
    // user 1's second-batch emission shows the carried state (2 events)
    assert(tws.exists(r => r.contains("[1,2,4.0]")),
      s"no cumulative second-batch emission for user 1 in $tws")
  }

  test("state data source: the dedup stream's store reads back offline " +
      "and its live keys are exactly the emitted fingerprints") {
    // Spark's statestore/state-metadata DSv2 readers are the offline
    // state-inspection surface a production streaming deployment leans
    // on (debugging a hot store, auditing state size per operator) —
    // prove the checkpoint this engine writes is readable by them and
    // CONSISTENT with the stream's output. The fixture's event-time
    // span (~500 s) sits inside the 1 h dedup horizon, so no key has
    // been evicted and the live key set must equal the sink's
    // fingerprint set exactly.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_statesrc_").toString
    val sunk = EventsStream.runDedupStreamAt(spark, TestSpark.Sf, tmp)
      .collect().map(_.getString(0)).toSet
    assert(sunk.nonEmpty)
    val meta = spark.read.format("state-metadata").load(s"$tmp/ckpt")
    val ops = meta.select("operatorName").collect()
      .map(_.getString(0)).toSeq
    assert(ops.exists(_.toLowerCase.contains("dedup")),
      s"unexpected operator metadata: $ops")
    val state = spark.read.format("statestore").load(s"$tmp/ckpt")
    val keys = state.select(col("key.fp")).collect()
      .map(_.getString(0)).toSet
    assert(keys == sunk,
      s"state keys (${keys.size}) != sink fingerprints (${sunk.size})")
  }

  test("merge-upsert replay guard: a re-delivered batch id is skipped, " +
      "an advancing id merges (update + insert paths)") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_merge_spec_").toString
    val b0 = Seq((1L, 10L, 100L), (2L, 5L, 50L))
      .toDF("bucket", "n", "sum_sq")
    assert(EventsStream.applyMergeBatch(spark, tmp, b0, 0L))
    // REPLAY of batch 0 (a foreachBatch retry): guard must refuse
    assert(!EventsStream.applyMergeBatch(spark, tmp, b0, 0L))
    // batch 1: bucket 1 updates, bucket 3 inserts
    val b1 = Seq((1L, 2L, 20L), (3L, 7L, 70L)).toDF("bucket", "n", "sum_sq")
    assert(EventsStream.applyMergeBatch(spark, tmp, b1, 1L))
    // a late replay of an OLD id after newer generations: refused too
    assert(!EventsStream.applyMergeBatch(spark, tmp, b0, 0L))
    val rows = EventsStream.applyMergeBatchRead(spark, tmp)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, 12L, 120L), (2L, 5L, 50L), (3L, 7L, 70L)),
      s"merged state wrong: $rows")
    // a TORN generation (dir exists, no _SUCCESS commit marker — a
    // crash mid-overwrite) must NOT count as applied: the retry of
    // that batch id goes through
    assert(new java.io.File(s"$tmp/gen/g2").mkdirs())
    assert(EventsStream.applyMergeBatch(spark, tmp, b1, 2L),
      "torn generation blocked its own retry")
    val rows2 = EventsStream.applyMergeBatchRead(spark, tmp)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows2 == Seq((1L, 14L, 140L), (2L, 5L, 50L), (3L, 14L, 140L)),
      s"post-retry state wrong: $rows2")
  }

  test("timer + multi-variable state SURVIVES a checkpointed restart: " +
      "counts span both runs, re-armed timers fire, unexpired hold") {
    withProvider(Some(RocksProvider)) {
      import spark.implicits._
      val root = java.nio.file.Files
        .createTempDirectory("graft_tws_restart_").toString
      val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
      def ship(name: String, events: Seq[Event]): Unit = {
        // stage as one parquet part, then move it into the watched dir
        val stage = s"$root/stage_$name"
        events.toDS().coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
      }
      def drain(): Unit = {
        val ev = spark.readStream
          .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
          .parquet(srcDir).as[Event]
        val q = EventsStream.timerSessions(ev, gapMs = 3600000L)
          .toDF().writeStream
          .outputMode(OutputMode.Update())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$root/out")
          }.start()
        q.awaitTermination()
      }
      // run 1: three users, 10-minute span — every timer arms at
      // last-event + 1h, none can fire (watermark stops at 00:10)
      ship("h1", Seq(
        Event(11, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(12, ts("2024-01-01 00:05:00"), 1, "view", 1.0),
        Event(21, ts("2024-01-01 00:02:00"), 2, "click", 1.0),
        Event(31, ts("2024-01-01 00:10:00"), 3, "click", 1.0)))
      drain()
      assert(!new java.io.File(s"$root/out").exists() ||
        spark.read.parquet(s"$root/out").isEmpty,
        "no timer may fire inside run 1's 10-minute watermark span")
      // run 2, SAME checkpoint: user 3 continues (re-arm), user 99
      // drives the watermark to 10:00
      ship("h2", Seq(
        Event(32, ts("2024-01-01 02:00:00"), 3, "view", 1.0),
        Event(99, ts("2024-01-01 10:00:00"), 99, "click", 1.0)))
      drain()
      val rows = spark.read.parquet(s"$root/out")
        .as[EventsStream.SessionSummary].collect().toSeq
      // users 1 and 2 close with RUN-1 state only — proof the
      // ValueState/ListState/timers were RESTORED, not rebuilt
      assert(rows.exists(r => r.user_id == 1 && r.n_events == 2 &&
        r.event_ids == Seq(11L, 12L)), s"user 1 state lost: $rows")
      assert(rows.exists(r => r.user_id == 2 && r.n_events == 1 &&
        r.event_ids == Seq(21L)), s"user 2 state lost: $rows")
      // user 3's session spans BOTH runs: the run-2 event re-armed the
      // restored timer and the emission carries ids from both files
      assert(rows.exists(r => r.user_id == 3 && r.n_events == 2 &&
        r.event_ids == Seq(31L, 32L)),
        s"user 3's cross-restart session wrong: $rows")
      // user 99's timer (11:00) is past the final watermark: held open
      assert(!rows.exists(_.user_id == 99), s"user 99 closed early: $rows")
    }
  }

  test("state-store provider matrix: every stateful stream agrees " +
      "across default and RocksDB") {
    // Patterns, hardest first: merging session windows (range read +
    // merge-and-replace), dropDuplicates keyed state, two-sided
    // stream-stream join state with expiry emission (outer), inner
    // join state, and cross-batch mapGroupsWithState.
    val runners: Seq[(String, () => Seq[String])] = Seq(
      ("session-window merge", () => EventsStream
        .runSessionWindowStream(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq),
      ("dropDuplicates dedup", () => EventsStream
        .runDedupStream(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq),
      ("interval join", () => EventsStream
        .runIntervalJoinStream(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq),
      ("interval join outer", () => EventsStream
        .runIntervalJoinOuterStream(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq),
      ("interval join full outer", () => EventsStream
        .runIntervalJoinFullStream(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq),
      ("interval join right outer", () => EventsStream
        .runIntervalJoinRightStream(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq),
      ("interval join left semi", () => EventsStream
        .runIntervalJoinSemiStream(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq),
      ("mapGroupsWithState incremental", () => driveActivityIncremental()))
    runners.foreach { case (nm, run) =>
      val dflt = withProvider(None)(run())
      val rocks = withProvider(Some(RocksProvider))(run())
      assert(rocks == dflt, s"$nm diverged under RocksDB")
      assert(rocks.nonEmpty, s"$nm produced no rows")
    }
  }
}
