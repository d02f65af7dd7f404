package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Money._
import graft.Q
import graft.Tables

/** Structured Streaming over the events table (beyond-reference surface:
  * the reference has no streaming concept at all — SURVEY §2.9).
  *
  * Each transform is defined on a plain DataFrame/Dataset so the SAME
  * code runs in batch (driver verification against the DuckDB oracle)
  * and under `readStream` (spec suite, via MemoryStream). Watermarks
  * bound state; aggregations are keyed on (window/session, key) so state
  * is hash-partitioned across executors — no driver-side state at any
  * scale.
  */
object EventsStream {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserActivity(
      user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling-window counts with a 1h watermark (streaming-safe). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(m(col("value"))).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("cnt"), col("total"))

  /** Session aggregation via the built-in session_window (gap-merged). */
  def sessions(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), dsum(m(col("value"))).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))

  /** Custom keyed state via mapGroupsWithState: running per-user activity
    * totals (the KeyValueGroupedDataset stateful-API surface). */
  def runningUserActivity(events: Dataset[Event]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserActivity(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** [[runningUserActivity]] on Spark 4's transformWithState — the
    * successor stateful API ("arbitrary stateful processing v2"):
    * state is declared as NAMED TYPED HANDLES on a StatefulProcessor
    * (a ValueState here) instead of one opaque GroupState, which is
    * what unlocks multiple state variables, per-variable TTL, timers,
    * and offline state-source inspection per variable. Semantics are
    * identical to the mapGroupsWithState form — the spec pins
    * result-equality on the same incremental drive — and the
    * streaming runtime requires the RocksDB provider for this API
    * (the matrix runs it there). */
  final class ActivityProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserActivity] {
    @transient private var totals:
        org.apache.spark.sql.streaming.ValueState[UserActivity] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserActivity]("activity",
        org.apache.spark.sql.Encoders.product[UserActivity],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserActivity] = {
      val prev =
        if (totals.exists()) totals.get() else UserActivity(uid, 0L, 0.0)
      var n = prev.n_events
      var tot = prev.total_value
      rows.foreach { e => n += 1; tot += e.value }
      val next = UserActivity(uid, n, tot)
      totals.update(next)
      Iterator.single(next)
    }
  }

  def runningUserActivityTws(events: Dataset[Event])
      : Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new ActivityProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  final case class SessionSummary(
      user_id: Long, n_events: Long, event_ids: Seq[Long])

  /** transformWithState's FULL surface — the capabilities the v1
    * stateful API structurally lacks, in one processor: TWO named
    * state variables per key (a ValueState event counter + a
    * ListState of the session's event ids) and a per-key EVENT-TIME
    * TIMER that closes the session when the watermark passes
    * last-event + gap. Input batches only accumulate state and re-arm
    * the key's single timer (previous timers deleted — listTimers /
    * deleteTimer is itself part of the surface); emission happens
    * exclusively on timer EXPIRY, where both variables are read,
    * emitted, and cleared. mapGroupsWithState can approximate this
    * only by serializing everything into one state object and
    * polling timeouts; here each variable is its own store column
    * family, separately TTL-able and separately visible to the
    * offline state reader. */
  final class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionSummary] {
    @transient private var count:
        org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private var ids:
        org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      ids = getHandle.getListState[Long]("ids",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessionSummary] = {
      var n = if (count.exists()) count.get() else 0L
      var maxTs = Long.MinValue
      rows.foreach { e =>
        n += 1
        ids.appendValue(e.event_id)
        maxTs = math.max(maxTs, e.ts.getTime)
      }
      count.update(n)
      // exactly one live timer per key: re-arm at last-event + gap
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(maxTs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(uid: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionSummary] = {
      val out = SessionSummary(uid,
        if (count.exists()) count.get() else 0L,
        ids.get().toSeq.sorted)
      count.clear()
      ids.clear()
      Iterator.single(out)
    }
  }

  /** Timer-closed sessions over a watermarked event stream (gap
    * default 10 s; event-time timers require TimeMode.EventTime and a
    * watermark on the input). */
  def timerSessions(events: Dataset[Event],
      gapMs: Long = 10000L): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update())
  }

  /** Custom state with 0..n outputs per group per batch — the
    * flatMapGroupsWithState surface: emit one alert row for every
    * multiple of `step` the user's cumulative value crosses. */
  def valueAlerts(events: Dataset[Event], step: Double): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Double, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[Double]) =>
          val before = state.getOption.getOrElse(0.0)
          var tot = before
          it.foreach(e => tot += e.value)
          state.update(tot)
          val from = math.floor(before / step).toLong + 1
          val to = math.floor(tot / step).toLong
          (from to to).iterator.map(level => (uid, level))
      }
  }

  /** Stream-stream INTERVAL join: each purchase joins the same user's
    * views from the preceding `boundSec` seconds. Both sides carry
    * watermarks and the join condition carries the time bound, so Spark
    * evicts join state older than watermark+bound — state is O(rate ×
    * bound) per user shard, never unbounded. Semantically identical to
    * the batch [[graft.operators.Temporal.rangeJoin]] (spec-proven);
    * batch uses the bin-replicated equi-join instead because a batch
    * theta join would nested-loop, while the streaming runtime keys
    * state on user_id and scans only the in-range buffer. */
  def intervalJoin(views: DataFrame, purchases: DataFrame,
      boundSec: Long, joinType: String = "inner"): DataFrame = {
    val v0 = views.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("v_event_id"),
        col("ts").as("v_ts"))
    val p0 = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user_id"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"))
    if (joinType == "inner") {
      // Bin-keyed INNER form (the batch rangeJoin's bin-replicated
      // equi-join applied to the stateful runtime): the symmetric hash
      // join evaluates its non-equi time predicate against EVERY
      // same-key buffered row, so keying state on user_id alone costs
      // Σ_u views_u × purchases_u interpreted evaluations per drain —
      // quadratic in per-user rate however selective the bound is.
      // Adding the time bin (bound-sized; views replicated to the two
      // bins their window can reach, purchases probing their own bin)
      // bounds each state bucket's probe set to one bound-width of
      // rows: pair evaluations become Σ_{u,bin} v × p — proportional
      // to the matchable neighborhood, not the user's history. A pair
      // (v, p) with p_ts ∈ [v_ts, v_ts + bound) has p's bin equal to
      // v's bin or v's bin + 1 and meets in exactly ONE bucket (the
      // two view copies live in distinct bins), so the inner join's
      // multiset output is unchanged row-for-row. Outer/semi variants
      // keep the plain key: a replicated view would null-emit or
      // semi-emit once per copy, changing their results.
      val binUs = boundSec * 1000000L
      val v = v0.withColumn("bin", explode(array(
        expr(s"unix_micros(v_ts) div $binUs"),
        expr(s"unix_micros(v_ts) div $binUs") + lit(1L))))
      val p = p0.withColumn("p_bin", expr(s"unix_micros(p_ts) div $binUs"))
      v.join(p,
        col("user_id") === col("p_user_id") &&
          col("bin") === col("p_bin") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr(s"interval $boundSec second"),
        joinType)
        .select(col("user_id"), col("v_event_id"), col("p_event_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    } else {
      v0.join(p0,
        col("user_id") === col("p_user_id") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr(s"interval $boundSec second"),
        joinType)
        .select(col("user_id"), col("v_event_id"), col("p_event_id"),
          (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
    }
  }

  /** LEFT OUTER form of [[intervalJoin]]: views with no purchase inside
    * the bound still emit (null-padded) — but only after the watermark
    * passes their join window, because the runtime must PROVE no match
    * can still arrive before releasing the unmatched row. That
    * state-expiry emission is a different runtime path from the inner
    * join's match-time emission, which is why it gets its own executed
    * entry. */
  def intervalJoinOuter(views: DataFrame, purchases: DataFrame,
      boundSec: Long): DataFrame =
    intervalJoin(views, purchases, boundSec, "left_outer")

  /** FULL OUTER form of [[intervalJoin]]: BOTH sides' unmatched rows
    * emit null-padded once the watermark proves their window closed —
    * a genuinely different runtime path from the left-outer entry,
    * because the runtime must track expiry emission on both state
    * stores, and the two sides' provability conditions are asymmetric
    * (they fall out of the same join bound read from each side): a
    * view's window closes at `v_ts + bound`, a purchase's at `p_ts`
    * itself (any future view has `v_ts ≥ watermark`, and matching
    * needs `v_ts ≤ p_ts`, so `p_ts < watermark` is the proof). The
    * output's `user_id` coalesces across sides — the view-side column
    * is null on purchase-expiry rows. */
  def intervalJoinFull(views: DataFrame, purchases: DataFrame,
      boundSec: Long): DataFrame =
    intervalJoinTwoSided(views, purchases, boundSec, "full_outer")

  /** RIGHT OUTER form: only the purchase side's unmatched rows emit on
    * watermark proof (`p_ts < watermark` — the purchase-side condition
    * [[intervalJoinFull]] derives); views expire silently. */
  def intervalJoinRight(views: DataFrame, purchases: DataFrame,
      boundSec: Long): DataFrame =
    intervalJoinTwoSided(views, purchases, boundSec, "right_outer")

  /** Shared assembly for the join types whose output can carry a NULL
    * view side (full/right): user_id coalesces across sides. */
  private def intervalJoinTwoSided(views: DataFrame, purchases: DataFrame,
      boundSec: Long, joinType: String): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id").as("v_user_id"),
        col("event_id").as("v_event_id"), col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("p_event_id"), col("ts").as("p_ts"))
    v.join(p,
      col("v_user_id") === col("p_user_id") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr(s"interval $boundSec second"),
      joinType)
      .select(coalesce(col("v_user_id"), col("p_user_id")).as("user_id"),
        col("v_event_id"), col("p_event_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** Streaming exact dedup by content fingerprint within the watermark
    * horizon (`dropDuplicatesWithinWatermark`): the state store holds one
    * 16-byte fingerprint per distinct document seen inside the horizon
    * and evicts beyond it — the bounded-state form of
    * [[graft.operators.Dedup.dedupExact]] for continuous ingestion. */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.functions.Text.md5Fingerprint(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")

  /** Batch form of [[sessions]] for the driver's oracle gate; the DuckDB
    * mirror reconstructs gap-sessions with lag + cumulative sum. The gap
    * predicate is `>=`: session_window's window is [t, t+gap), so two
    * events EXACTLY gap apart start separate sessions — `> gap` in the
    * oracle would merge them and flip the compare on an exact-gap pair. */
  val sessionizeEvents: Q = Q.df(
    "sessionize_events",
    s"""with marked as (
       |  select user_id, ts, value,
       |    case when lag(ts) over (partition by user_id order by ts) is null
       |           or ts - lag(ts) over (partition by user_id order by ts)
       |              >= interval 10 minute
       |         then 1 else 0 end as new_s
       |  from events),
       |numbered as (
       |  select user_id, ts, value,
       |    sum(new_s) over (partition by user_id order by ts
       |                     rows unbounded preceding) as sid
       |  from marked)
       |select user_id, min(ts) as session_start, max(ts) as session_end,
       |  count(*) as n_events,
       |  cast(sum(${sqlM("value")}) as double) as total_value
       |from numbered
       |group by user_id, sid
       |order by user_id, session_start""".stripMargin) { (s, dir) =>
    sessions(Tables.df(s, dir, "events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Dynamic-gap sessionization: the gap is a PER-EVENT expression —
    * a purchase keeps its session alive for 30 minutes, anything else
    * for 10 — the session_window(col, gapExpr) surface, which merges
    * windows [ts, ts+gap(e)) while they overlap. The oracle
    * reconstructs the same merge with gaps-and-islands arithmetic: a
    * new session starts when an event's time reaches the running MAX
    * of all preceding events' window ends (a plain lag is wrong here —
    * an earlier long-gap event can outlast a later short-gap one).
    * Every comparison is integer micros; start/end are element picks
    * and exact maxima. */
  val sessionDynamicGap: Q = Q.df(
    "window_session_dynamic_gap",
    """with o as (select user_id, event_id, ts,
      |    case when event_type = 'purchase' then interval 30 minute
      |         else interval 10 minute end as gap
      |  from events),
      |m as (select user_id, event_id, ts, gap,
      |    max(epoch_us(ts + gap)) over (partition by user_id
      |      order by ts, event_id
      |      rows between unbounded preceding and 1 preceding) as prev_end
      |  from o),
      |flagged as (select user_id, event_id, ts, gap,
      |    case when prev_end is null or epoch_us(ts) >= prev_end
      |         then 1 else 0 end as new_s
      |  from m),
      |numbered as (select user_id, ts, gap,
      |    sum(new_s) over (partition by user_id order by ts, event_id
      |      rows unbounded preceding) as sid
      |  from flagged)
      |select user_id, min(ts) as session_start,
      |  max(ts + gap) as session_end,
      |  cast(count(*) as bigint) as n_events
      |from numbered group by user_id, sid
      |order by user_id, session_start""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "events")
      .groupBy(
        session_window(col("ts"),
          when(col("event_type") === "purchase", "30 minutes")
            .otherwise("10 minutes")),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Watermark horizon for the lateness audit (micros): 1 hour. */
  val LatenessHorizonUs = 3600L * 1000000L

  /** Watermark-lateness audit — the batch quantification of what a
    * streaming watermark WOULD drop: an event is late-beyond-watermark
    * when the stream's high-water event time at its arrival (running
    * max of ts in arrival order = event_id) has already advanced more
    * than the horizon past the event's own time. Exactly
    * `withWatermark("ts", "1 hour")`'s drop rule, made countable; run
    * before picking a horizon to size the completeness/latency trade.
    *
    * Partitioned per event_type (per-source watermarks), so the running
    * max is a partitioned window — no single global sort at any scale.
    * All arithmetic is int64 epoch micros. */
  val watermarkLateness: Q = Q.df(
    "stream_watermark_lateness",
    s"""with o as (select event_type, event_id, epoch_us(ts) as tus
       |           from events),
       |hw as (select event_type, event_id, tus,
       |         max(tus) over (partition by event_type order by event_id
       |           rows between unbounded preceding and current row) as high
       |       from o)
       |select event_type, cast(count(*) as bigint) as n_events,
       |  cast(sum(case when high - tus > $LatenessHorizonUs
       |    then 1 else 0 end) as bigint) as n_late,
       |  cast(max(high - tus) as bigint) as max_lateness_us
       |from hw group by event_type order by event_type""".stripMargin) {
    (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.df(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("high", max(col("tus")).over(w))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("high") - col("tus") > LatenessHorizonUs, 1L)
            .otherwise(0L)).as("n_late"),
          max(col("high") - col("tus")).as("max_lateness_us"))
        .orderBy(col("event_type"))
  }

  /** Stateful streaming partition count for the executed entries. A
    * stateful operator mints one state-store instance PER shuffle
    * partition PER stateful op, each paying checkpoint/snapshot IO
    * every micro-batch — a fixed tax independent of data volume. Batch
    * queries size shuffle.partitions to CPU count (32 here); a stream's
    * state partitioning should instead be sized to stream THROUGHPUT
    * (it is fixed at first checkpoint and re-used for the query's
    * lifetime). 8 is right for the fixture's volume; a 100 TB ingest
    * would raise it with measured rate, not core count. */
  val StreamShufflePartitions = "8"

  /** Run `body` with the stream-sized shuffle partitioning, restoring
    * the session's batch setting after (entries run sequentially in
    * Verify/Bench, so the temporary session-conf flip is confined). */
  private def withStreamPartitions[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, StreamShufflePartitions)
    try body finally s.conf.set(key, prev)
  }

  /** Execute [[hourlyCounts]] through the REAL streaming runtime — not
    * the batch-parity shortcut the other entries use: a parquet
    * file-source stream over the fixture, `Trigger.AvailableNow` (drain
    * everything available, then stop — the deterministic batch-replay
    * trigger), Complete output mode, and a `foreachBatch` sink that
    * writes each full result distributed to parquet. Nothing
    * data-sized touches the driver: source discovery is metadata, the
    * aggregation state is hash-partitioned across executors, and the
    * sink is a normal distributed write (memory-sink collect is
    * deliberately avoided). The returned frame reads the sink files
    * back — exactly what a downstream consumer of the stream would do. */
  def runHourlyCountsStream(s: SparkSession, dir: String): DataFrame =
    runHourlyCountsStreamAt(s, dir,
      java.nio.file.Files.createTempDirectory("graft_stream_").toString)

  /** Same runner with a caller-owned work dir, so a RESTART can reuse
    * the checkpoint: re-starting against an already-drained source
    * replays nothing (offsets are committed), leaving the sink
    * byte-identical — the exactly-once restart contract the spec
    * pins. */
  def runHourlyCountsStreamAt(s: SparkSession, dir: String,
      tmp: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val outDir = s"$tmp/out"
    val q = hourlyCounts(Tables.eventsStream(s, dir))
      .writeStream
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Complete mode re-emits the FULL result each micro-batch;
        // overwrite keeps the sink dir equal to the latest emission.
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  /** Driver-gated executed-streaming entry: the streamed tumbling-window
    * counts must equal the plain batch GROUP BY the oracle spells
    * (Complete mode never drops state, so watermarking does not perturb
    * the result; window(ts, '1 hour').start == date_trunc('hour', ts)). */
  val hourlyCountsStreamed: Q = Q.df(
    "stream_hourly_counts",
    s"""select date_trunc('hour', ts) as wstart, event_type,
       |  cast(count(*) as bigint) as cnt,
       |  cast(sum(${sqlM("value")}) as double) as total
       |from events group by 1, 2 order by 1, 2""".stripMargin) { (s, dir) =>
    runHourlyCountsStream(s, dir)
      .orderBy(col("wstart"), col("event_type"))
  }

  /** Execute [[dedupStream]]'s `dropDuplicatesWithinWatermark` state
    * path end-to-end: documents flow through a file-source stream with
    * a synthetic arrival timestamp (doc_id seconds — deterministic;
    * the fixture table has no arrival column), the state store holds
    * one fingerprint per distinct document inside the watermark
    * horizon, and first-seen rows append to a parquet sink. WHICH
    * duplicate row passes first is parallel-order-dependent, so the
    * entry emits only the fingerprint SET — deterministic, and equal
    * to batch `distinct` when everything fits one horizon. */
  def runDedupStream(s: SparkSession, dir: String): DataFrame =
    runDedupStreamAt(s, dir,
      java.nio.file.Files.createTempDirectory("graft_stream_").toString)

  /** [[runDedupStream]] against a CALLER-owned working directory, so
    * the checkpoint (`<tmp>/ckpt`) outlives the run — the state-source
    * spec reads the state store back offline from it. */
  def runDedupStreamAt(s: SparkSession, dir: String,
      tmp: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val outDir = s"$tmp/out"
    val raw = s.read.parquet(s"$dir/documents.parquet")
    val docs = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      // +1 day: Spark's INITIAL watermark is epoch 0, and a row whose
      // event time sits exactly on the watermark is dropped as late —
      // doc_id 0 at raw epoch seconds would silently vanish.
      .withColumn("ts",
        timestamp_micros((col("doc_id") + lit(86400L)) * 1000000L))
    val q = dedupStream(docs)
      .select(col("fp"))
      .writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Append mode emits each key's first-seen row exactly once
        // across batches, so the sink accumulates the distinct set.
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val dedupStreamed: Q = Q.df(
    "stream_dedup_fingerprints",
    """select distinct md5(lower(text)) as fp
      |from documents order by fp""".stripMargin) { (s, dir) =>
    runDedupStream(s, dir).orderBy(col("fp"))
  }

  /** The `mapGroupsWithState` surface executed through the driver gate:
    * in batch mode each group is processed once with empty prior state,
    * so [[runningUserActivity]] degenerates to a grouped aggregation —
    * same code, both runtimes (the incremental path is spec-proven on a
    * MemoryStream). The double sum inside the state function folds in
    * iterator order; round(6) absorbs the ~1e-11 association error
    * against the oracle's exact decimal sum (fixture values are
    * 2-decimal, so totals sit far from rounding boundaries). */
  val userActivityState: Q = Q.df(
    "stream_user_activity_state",
    """select user_id, cast(count(*) as bigint) as n_events,
      |  round(cast(sum(cast(value as decimal(12,2))) as double), 6)
      |    as total_value
      |from events group by user_id order by user_id""".stripMargin) {
    (s, dir) =>
      import s.implicits._
      val ev = Tables.df(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[Event]
      runningUserActivity(ev).toDF()
        .select(col("user_id"), col("n_events"),
          round(col("total_value"), 6).as("total_value"))
        .orderBy(col("user_id"))
  }

  /** The RocksDB provider class — transformWithState's required state
    * backend (and the production choice generally). */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Execute [[runningUserActivityTws]] through the REAL streaming
    * runtime (the API has no batch shortcut here: batch evaluation
    * needs a state-store coordinator only the streaming runtime
    * mints): events as a file-source stream, AvailableNow drain,
    * Update-mode emissions appended to parquet with their micro-batch
    * id, RocksDB provider (required by transformWithState). State
    * carries across batches, so each user's LAST emission holds the
    * full cumulative totals regardless of how the drain was split into
    * micro-batches — the final aggregation picks it per user. */
  def runTransformWithStateStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, RocksDbProvider)
      try {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
        val outDir = s"$tmp/out"
        val ev = Tables.eventsStream(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value")).as[Event]
        val q = runningUserActivityTws(ev).toDF()
          .writeStream
          .outputMode(OutputMode.Update())
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            batch.withColumn("batch_id", lit(bid))
              .write.mode("append").parquet(outDir)
          }
          .start()
        q.awaitTermination()
        // last emission per user: struct max is lexicographic on
        // batch_id first (no window, one map-side-combined aggregate)
        s.read.parquet(outDir)
          .groupBy(col("user_id"))
          .agg(max(struct(col("batch_id"), col("n_events"),
            col("total_value"))).as("st"))
          .select(col("user_id"), col("st.n_events").as("n_events"),
            round(col("st.total_value"), 6).as("total_value"))
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }

  /** transformWithState through the driver gate, driven end-to-end on
    * the streaming runtime under RocksDB. Oracle discipline as
    * [[userActivityState]]: iterator-order double fold inside the
    * processor, round(6) at the surface. */
  val transformWithStateQ: Q = Q.df(
    "stream_transform_with_state",
    """select user_id, cast(count(*) as bigint) as n_events,
      |  round(cast(sum(cast(value as decimal(12,2))) as double), 6)
      |    as total_value
      |from events group by user_id order by user_id""".stripMargin) {
    (s, dir) =>
      runTransformWithStateStream(s, dir).orderBy(col("user_id"))
  }

  /** Inactivity gap for the executed timer-session entry: 1 hour keeps
    * both populations non-trivial at every fixture scale (sf0.001:
    * 14 of 15 users close; sf0.1: 1380 of 1500 — the rest are held
    * open because the final watermark never proves them quiet). */
  val TimerSessionGapMs: Long = 3600000L

  /** Execute [[timerSessions]] end-to-end: event-time TIMERS through
    * the real streaming runtime (RocksDB provider — required by
    * transformWithState). The single-file fixture drains in ONE data
    * micro-batch (same assumption the interval-join entries document),
    * so every user's timer is armed once at their last event + gap;
    * the trailing no-data micro-batch then runs with the eviction
    * watermark at the global max event time and fires every timer ≤ it
    * (`TimerStateImpl.getExpiredTimers` iterates `timerTs <=
    * threshold`, threshold = `eventTimeWatermarkForEviction` —
    * verified against the Spark 4.1.2 bytecode). Each fired timer
    * emits BOTH state variables (count + sorted id list) exactly once;
    * users whose last event is within one gap of the corpus max stay
    * open and never emit — watermark-gated emission is the operator's
    * contract, so the oracle computes the same provability condition
    * (ms-floored, the precision Spark tracks watermarks at). */
  def runTimerSessionsStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = s.conf.getOption(key)
      s.conf.set(key, RocksDbProvider)
      try {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
        val outDir = s"$tmp/out"
        val ev = Tables.eventsStream(s, dir)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value")).as[Event]
        val q = timerSessions(ev, gapMs = TimerSessionGapMs).toDF()
          .writeStream
          .outputMode(OutputMode.Update())
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir)
          }
          .start()
        q.awaitTermination()
        s.read.parquet(outDir)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }

  val timerSessionsStreamed: Q = Q.df(
    "stream_timer_sessions",
    s"""with w as (select max(epoch_us(ts)) // 1000 as w from events)
       |select user_id, cast(count(*) as bigint) as n_events,
       |  array_to_string(list_sort(list(event_id)), ',') as event_ids
       |from events cross join w
       |group by user_id, w.w
       |having max(epoch_us(ts)) // 1000 + ${TimerSessionGapMs} <= w.w
       |order by user_id""".stripMargin) { (s, dir) =>
    runTimerSessionsStream(s, dir)
      // the driver compare needs scalar cells: join the (already
      // sorted) id list into one csv string
      .select(col("user_id"), col("n_events"),
        array_join(col("event_ids"), ",").as("event_ids"))
      .orderBy(col("user_id"))
  }

  /** Stream-STATIC dimension join executed end-to-end — the standard
    * production enrichment front: a fact stream joined per micro-batch
    * against a static dimension table (the static side is re-planned
    * each batch, so a dimension refresh between batches would be
    * picked up — the semantics that distinguish this from a one-shot
    * batch join). The dimension is explicitly `broadcast()`: at 100 TB
    * the stream side never shuffles for this join — each micro-batch's
    * scan gets the dim hash table shipped to it, and the downstream
    * aggregation is the only exchange. Complete-mode accumulation
    * across batches equals the one-shot batch join the oracle runs. */
  def runStaticJoinStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
      val outDir = s"$tmp/out"
      val dim = broadcast(Tables.df(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")))
      val joined = Tables.eventsStream(s, dir)
        .join(dim, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(m(col("value"))).as("total"))
      val q = joined.writeStream
        .outputMode(OutputMode.Complete)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(outDir)
        }
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
    }

  val staticJoinStreamed: Q = Q.df(
    "stream_static_join",
    s"""select c_mktsegment, event_type,
       |  cast(count(*) as bigint) as n,
       |  cast(sum(${sqlM("value")}) as double) as total
       |from events join customer on user_id = c_custkey
       |group by 1, 2 order by 1, 2""".stripMargin) { (s, dir) =>
    runStaticJoinStream(s, dir)
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Execute the stream-stream INTERVAL join end-to-end: views and
    * purchases read as two independent file-source streams over the
    * same events fixture, joined with watermarks + a time-bound
    * condition (state evicted beyond watermark+bound), drained with
    * AvailableNow into an append parquet sink. The result equals the
    * batch range join because each single-file source drains in one
    * micro-batch — both sides' state is fully resident when the join
    * runs; the oracle is the same bounded theta join `join_range`
    * uses (600 s == [[graft.operators.Temporal.RangeWindowSec]]). */
  def runIntervalJoinStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
    val outDir = s"$tmp/out"
    def side(eventType: String): DataFrame =
      Tables.eventsStream(s, dir).filter(col("event_type") === eventType)
    val joined = intervalJoin(side("view"), side("purchase"),
      graft.operators.Temporal.RangeWindowSec)
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val intervalJoinStreamed: Q = Q.df(
    "stream_interval_join",
    s"""select v.user_id, v.event_id as v_event_id,
       |  p.event_id as p_event_id,
       |  epoch_us(p.ts) - epoch_us(v.ts) as gap_us
       |from (select * from events where event_type = 'view') v
       |join (select * from events where event_type = 'purchase') p
       |  on v.user_id = p.user_id
       | and p.ts >= v.ts
       | and p.ts < v.ts + interval ${graft.operators.Temporal.RangeWindowSec} second
       |order by v_event_id, p_event_id""".stripMargin) { (s, dir) =>
    runIntervalJoinStream(s, dir)
      .orderBy(col("v_event_id"), col("p_event_id"))
  }

  /** Execute the LEFT OUTER interval join end-to-end. Matched rows
    * emit at match time; an unmatched view emits null-padded only once
    * the GLOBAL watermark — min(viewMax, purchaseMax) − horizon, the
    * min over both sides' event-time watermarks — proves no purchase
    * can still arrive for its window (v_ts + bound < watermark). A
    * drained stream therefore holds back the unmatched tail that proof
    * never reaches, and the ORACLE computes exactly the same
    * provability condition instead of pretending the batch left join
    * and the stream agree unconditionally — watermark-bounded emission
    * IS the operator's contract, so it is part of the compare. The
    * oracle floors the side maxima to MILLISECONDS before subtracting
    * the horizon, because that is the precision Spark tracks event-time
    * watermarks at (EventTimeStats stores event time / 1000) — a
    * microsecond-exact watermark would sit up to ~1 ms ahead of the
    * runtime's and could claim provability for a row the runtime still
    * holds. */
  def runIntervalJoinOuterStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
    val outDir = s"$tmp/out"
    def side(eventType: String): DataFrame =
      Tables.eventsStream(s, dir).filter(col("event_type") === eventType)
    val joined = intervalJoinOuter(side("view"), side("purchase"),
      graft.operators.Temporal.RangeWindowSec)
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val intervalJoinOuterStreamed: Q = Q.df(
    "stream_interval_join_outer", {
      val boundSec = graft.operators.Temporal.RangeWindowSec
      s"""with v as (select user_id, event_id, ts from events
         |           where event_type = 'view'),
         |p as (select * from events where event_type = 'purchase'),
         |wm as (select (least((select max(epoch_us(ts)) // 1000 from v),
         |                     (select max(epoch_us(ts)) // 1000 from p))
         |          - 3600000) * 1000 as w)
         |select v.user_id, v.event_id as v_event_id,
         |  p.event_id as p_event_id,
         |  epoch_us(p.ts) - epoch_us(v.ts) as gap_us
         |from v left join p
         |  on v.user_id = p.user_id
         | and p.ts >= v.ts
         | and p.ts < v.ts + interval $boundSec second
         |cross join wm
         |where p.event_id is not null
         |   or epoch_us(v.ts) + ${boundSec * 1000000L} < wm.w
         |order by v_event_id, p_event_id nulls first""".stripMargin
    }) { (s, dir) =>
    runIntervalJoinOuterStream(s, dir)
      .orderBy(col("v_event_id"), col("p_event_id"))
  }

  /** Execute the FULL OUTER interval join end-to-end (the
    * [[runIntervalJoinOuterStream]] drive with both-side expiry
    * emission). The oracle applies the two provability conditions the
    * doc on [[intervalJoinFull]] derives, each against the GLOBAL
    * watermark floored to Spark's millisecond tracking precision. */
  def runIntervalJoinFullStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
    val outDir = s"$tmp/out"
    def side(eventType: String): DataFrame =
      Tables.eventsStream(s, dir).filter(col("event_type") === eventType)
    val joined = intervalJoinFull(side("view"), side("purchase"),
      graft.operators.Temporal.RangeWindowSec)
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val intervalJoinFullStreamed: Q = Q.df(
    "stream_interval_join_full", {
      val boundSec = graft.operators.Temporal.RangeWindowSec
      s"""with v as (select user_id, event_id, ts from events
         |           where event_type = 'view'),
         |p as (select user_id, event_id, ts from events
         |      where event_type = 'purchase'),
         |wm as (select (least((select max(epoch_us(ts)) // 1000 from v),
         |                     (select max(epoch_us(ts)) // 1000 from p))
         |          - 3600000) * 1000 as w)
         |select coalesce(v.user_id, p.user_id) as user_id,
         |  v.event_id as v_event_id,
         |  p.event_id as p_event_id,
         |  epoch_us(p.ts) - epoch_us(v.ts) as gap_us
         |from v full join p
         |  on v.user_id = p.user_id
         | and p.ts >= v.ts
         | and p.ts < v.ts + interval $boundSec second
         |cross join wm
         |where (v.event_id is not null and p.event_id is not null)
         |   or (p.event_id is null and v.event_id is not null
         |       and epoch_us(v.ts) + ${boundSec * 1000000L} < wm.w)
         |   or (v.event_id is null and p.event_id is not null
         |       and epoch_us(p.ts) < wm.w)
         |order by v_event_id nulls first, p_event_id nulls first"""
        .stripMargin
    }) { (s, dir) =>
    runIntervalJoinFullStream(s, dir)
      .orderBy(col("v_event_id").asc_nulls_first,
        col("p_event_id").asc_nulls_first)
  }

  /** Execute the RIGHT OUTER interval join end-to-end ([[
    * runIntervalJoinFullStream]]'s drive with purchase-side-only expiry
    * emission); completes the executed join-type matrix
    * inner / left / right / full. */
  def runIntervalJoinRightStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
    val outDir = s"$tmp/out"
    def side(eventType: String): DataFrame =
      Tables.eventsStream(s, dir).filter(col("event_type") === eventType)
    val joined = intervalJoinRight(side("view"), side("purchase"),
      graft.operators.Temporal.RangeWindowSec)
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val intervalJoinRightStreamed: Q = Q.df(
    "stream_interval_join_right", {
      val boundSec = graft.operators.Temporal.RangeWindowSec
      s"""with v as (select user_id, event_id, ts from events
         |           where event_type = 'view'),
         |p as (select user_id, event_id, ts from events
         |      where event_type = 'purchase'),
         |wm as (select (least((select max(epoch_us(ts)) // 1000 from v),
         |                     (select max(epoch_us(ts)) // 1000 from p))
         |          - 3600000) * 1000 as w)
         |select coalesce(v.user_id, p.user_id) as user_id,
         |  v.event_id as v_event_id,
         |  p.event_id as p_event_id,
         |  epoch_us(p.ts) - epoch_us(v.ts) as gap_us
         |from v right join p
         |  on v.user_id = p.user_id
         | and p.ts >= v.ts
         | and p.ts < v.ts + interval $boundSec second
         |cross join wm
         |where v.event_id is not null
         |   or epoch_us(p.ts) < wm.w
         |order by v_event_id nulls first, p_event_id""".stripMargin
    }) { (s, dir) =>
    runIntervalJoinRightStream(s, dir)
      .orderBy(col("v_event_id").asc_nulls_first, col("p_event_id"))
  }

  /** LEFT SEMI form of [[intervalJoin]]: a view emits (its own columns
    * only, AT MOST ONCE) when some purchase lands inside its window —
    * the streaming "sessions that converted" filter. A genuinely
    * distinct runtime path from the four outer/inner types: on match
    * the runtime must mark the left row as already-emitted in its state
    * store so a SECOND matching purchase cannot re-emit it (inner would
    * emit again; outer tracks expiry instead), and the purchase side
    * contributes no output columns at all. Unmatched views age out of
    * state silently — no expiry emission — so the drained result needs
    * no watermark-provability clause: it is exactly the EXISTS
    * semi-join the oracle states. */
  def intervalJoinSemi(views: DataFrame, purchases: DataFrame,
      boundSec: Long): DataFrame = {
    val v = views.withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("v_event_id"),
        col("ts").as("v_ts"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user_id"), col("ts").as("p_ts"))
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr(s"interval $boundSec second"),
      "left_semi")
      .select(col("user_id"), col("v_event_id"),
        unix_micros(col("v_ts")).as("v_ts_us"))
  }

  /** Execute the LEFT SEMI interval join end-to-end through the real
    * streaming runtime (AvailableNow drain, checkpointed state,
    * match-time at-most-once emission). */
  def runIntervalJoinSemiStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
    val outDir = s"$tmp/out"
    def side(eventType: String): DataFrame =
      Tables.eventsStream(s, dir).filter(col("event_type") === eventType)
    val joined = intervalJoinSemi(side("view"), side("purchase"),
      graft.operators.Temporal.RangeWindowSec)
    val q = joined.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val intervalJoinSemiStreamed: Q = Q.df(
    "stream_interval_join_semi", {
      val boundSec = graft.operators.Temporal.RangeWindowSec
      s"""select v.user_id, v.event_id as v_event_id,
         |  epoch_us(v.ts) as v_ts_us
         |from (select * from events where event_type = 'view') v
         |where exists (
         |  select 1 from events p
         |  where p.event_type = 'purchase'
         |    and p.user_id = v.user_id
         |    and p.ts >= v.ts
         |    and p.ts < v.ts + interval $boundSec second)
         |order by v_event_id""".stripMargin
    }) { (s, dir) =>
    runIntervalJoinSemiStream(s, dir).orderBy(col("v_event_id"))
  }

  /** The custom DSv2 source's STREAMING face executed through the real
    * runtime: the range source drains under admission control (16384
    * rows per micro-batch → 7 batches for 100k rows, offsets
    * checkpointed between them), a Complete-mode aggregation
    * accumulates across the batches, and the final state must equal
    * the one-shot batch aggregate the oracle computes — proving offset
    * continuity: any dropped or replayed window would shift a bucket
    * count. */
  def runRangeSourceStream(s: SparkSession): DataFrame =
    runRangeSourceStreamAt(s,
      java.nio.file.Files.createTempDirectory("graft_stream_").toString)

  def runRangeSourceStreamAt(s: SparkSession, tmp: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val outDir = s"$tmp/out"
    val q = s.readStream
      .format(classOf[graft.sources.RangeTableProvider].getName)
      .option("end", "100000").option("slices", "4")
      .option("batchRows", "16384")
      .load()
      .groupBy((col("id") % 7).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("sq")).as("sum_sq"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val customSourceStreamed: Q = Q.df(
    "stream_custom_source",
    """with t as (select range as id, range * range as sq
      |  from range(0, 100000))
      |select id % 7 as bucket, cast(count(*) as bigint) as n,
      |  cast(sum(sq) as bigint) as sum_sq
      |from t group by bucket order by bucket""".stripMargin) { (s, dir) =>
    runRangeSourceStream(s).orderBy(col("bucket"))
  }

  /** Latest applied MERGE generation under `tmp/gen`: dirs are named
    * `g<batchId>`, so the newest id IS the replay high-watermark. A
    * generation counts as APPLIED only once its `_SUCCESS` marker
    * exists — a torn overwrite (crash mid-write) must re-apply, not
    * read as committed (the commit-marker discipline a table format's
    * transaction log provides for real). */
  private def latestGen(tmp: String): Option[(Long, java.io.File)] = {
    val d = new java.io.File(s"$tmp/gen")
    Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("g") &&
        new java.io.File(f, "_SUCCESS").exists())
      .flatMap(f =>
        scala.util.Try(f.getName.drop(1).toLong).toOption.map(_ -> f))
      .sortBy(_._1).lastOption
  }

  /** Apply ONE micro-batch's per-bucket aggregate to the running
    * target by MERGE semantics — WHEN MATCHED add the deltas, WHEN NOT
    * MATCHED insert — via the same full-outer + coalesce rewrite the
    * batch `dml_merge_upsert` entry uses (parquet has no native MERGE;
    * the rewrite is the portable form). Exactly-once under retries
    * comes from the REPLAY GUARD, not from luck: each apply writes a
    * new generation directory named by its batch id, and a batch whose
    * id is ≤ the newest generation is skipped — the transactional
    * (streamId, batchId) high-watermark idiom every foreachBatch sink
    * that does non-idempotent work must carry (additive MERGE applied
    * twice would double-count). Returns true when the batch was
    * applied, false when the guard skipped it (spec-pinned). */
  def applyMergeBatch(s: SparkSession, tmp: String, agg: DataFrame,
      bid: Long): Boolean = {
    val cur = latestGen(tmp)
    if (cur.exists(_._1 >= bid)) false
    else {
      val next = cur match {
        case None => agg
        case Some((_, f)) =>
          s.read.parquet(f.toString)
            .select(col("bucket"), col("n").as("tn"),
              col("sum_sq").as("tsq"))
            .join(agg, Seq("bucket"), "full_outer")
            .select(col("bucket"),
              (coalesce(col("tn"), lit(0L)) +
                coalesce(col("n"), lit(0L))).as("n"),
              (coalesce(col("tsq"), lit(0L)) +
                coalesce(col("sum_sq"), lit(0L))).as("sum_sq"))
      }
      next.write.mode("overwrite").parquet(s"$tmp/gen/g$bid")
      true
    }
  }

  /** The current merged target (latest generation); empty when none. */
  def applyMergeBatchRead(s: SparkSession, tmp: String): DataFrame =
    latestGen(tmp) match {
      case Some((_, f)) => s.read.parquet(f.toString)
      case None => s.emptyDataFrame
    }

  /** Streaming MERGE upsert executed end-to-end — the CDC-apply
    * pattern: the custom DSv2 range source drains under admission
    * control (16384 rows/batch → 7 micro-batches), and EACH batch's
    * per-bucket aggregate MERGEs into the running target (batch 0
    * takes the all-INSERT path, batches 1-6 the all-UPDATE path; a
    * batch straddling a new bucket would take both). The final target
    * must equal the one-shot aggregate — any dropped, replayed, or
    * double-applied batch shifts a bucket's count. At 100 TB each
    * apply touches only target ∪ batch keys; generations are the swap
    * a table format (Delta/Iceberg) would do transactionally. */
  def runMergeUpsertStream(s: SparkSession): DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream_").toString
      val q = s.readStream
        .format(classOf[graft.sources.RangeTableProvider].getName)
        .option("end", "100000").option("slices", "4")
        .option("batchRows", "16384")
        .load()
        .writeStream
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          val agg = batch
            .groupBy((col("id") % 11).as("bucket"))
            .agg(count(lit(1)).as("n"), sum(col("sq")).as("sum_sq"))
          applyMergeBatch(s, tmp, agg, bid)
          ()
        }
        .start()
      q.awaitTermination()
      applyMergeBatchRead(s, tmp)
    }

  val mergeUpsertStreamed: Q = Q.df(
    "stream_merge_upsert",
    """with t as (select range as id, range * range as sq
      |  from range(0, 100000))
      |select id % 11 as bucket, cast(count(*) as bigint) as n,
      |  cast(sum(sq) as bigint) as sum_sq
      |from t group by bucket order by bucket""".stripMargin) { (s, dir) =>
    runMergeUpsertStream(s).orderBy(col("bucket"))
  }

  /** Streaming PARTITION-PRUNED row-level MERGE — the CDC-apply
    * pattern over a date-partitioned row-level target: the change
    * stream is staged as one file per batch and admitted one file per
    * trigger, and each micro-batch's apply rewrites ONLY the partitions
    * its keys touch (dynamic partition overwrite via
    * [[graft.operators.Dml.applyMergePrunedBatch]]) — untouched
    * partition files stay byte-identical, the shape a 100 TB CDC
    * pipeline needs (a daily batch rewrites 3 of 3000 day-partitions).
    *
    * Exactly-once here needs NO generation guard, unlike the additive
    * [[runMergeUpsertStream]]: a pruned apply is IDEMPOTENT by
    * construction (batch values do not derive from the target, and
    * re-applying anti-joins the same keys back out before re-inserting
    * them), so a replayed micro-batch converges to the same partition
    * content. The final table must equal the one-shot oracle — any
    * dropped batch loses its year's updates. */
  /** Memoized CDC staging (one parquet file per batch, name-ordered,
    * admitted one per trigger): the staged change files are a
    * deterministic function of the fixture and exist BEFORE the
    * measured apply starts — a CDC pipeline's arriving files are not
    * re-minted per drain. The memoized dir is read-only to the runs
    * (each run drains it against a fresh checkpoint) and is released
    * on family drain. */
  private val stagedCdcCache =
    new graft.plans.Memo[(SparkSession, String, String), String](
      graft.plans.Scratch.deleteTree)

  private def stagedCdcDir(s: SparkSession, dir: String, name: String)(
      slices: => Seq[DataFrame]): String =
    stagedCdcCache.once((s, dir, name)) {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_stagedcdc_${name}_").toString
      // a failure mid-staging never registers with the memo, so the
      // half-written tree would leak until process exit — delete it on
      // the way out and rethrow
      try {
        val cdcDir = s"$tmp/cdc"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdcDir))
        slices.zipWithIndex.foreach { case (df, i) =>
          val stage = s"$tmp/stage$i"
          df.coalesce(1).write.parquet(stage)
          val part = new java.io.File(stage).listFiles()
            .find(f => f.getName.endsWith(".parquet"))
            .getOrElse(sys.error(
              s"staged CDC slice $i of $name: no parquet part in $stage"))
          java.nio.file.Files.move(part.toPath,
            java.nio.file.Paths.get(s"$cdcDir/b$i.parquet"))
        }
        // report the PARENT as the memo value so the release deletes the
        // whole staging tree; the cdc subdir is what streams read
        tmp
      } catch {
        case e: Throwable => graft.plans.Scratch.deleteTree(tmp); throw e
      }
    } + "/cdc"

  def runMergePrunedStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      import graft.operators.Dml
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream_").toString
      Dml.createMergePrunedTarget(s, dir)
      // stage the CDC stream: one parquet file per merge year, flat
      // dir, name-ordered — the file source admits them one per trigger
      val cdcDir = stagedCdcDir(s, dir, "mergepruned") {
        val base = Dml.mergePrunedBase(s, dir)
        Dml.MergeYears.map(y => Dml.mergePrunedBatch(base, y))
      }
      val schema = s.read.parquet(cdcDir).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(cdcDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          Dml.applyMergePrunedBatch(s, batch)
          ()
        }
        .start()
      // the result is read from the managed target table, so the
      // staged CDC files + checkpoint are pure scratch once the drain
      // finishes — delete them or every bench warm-up/sample mints
      // another graft_stream_ dir for the process lifetime
      try q.awaitTermination() finally deleteTree(tmp)
      s.table(Dml.PrunedTarget)
        .select(col("o_orderkey"), col("cents"), col("yr"))
    }

  val mergePrunedStreamed: Q = Q.df(
    "stream_merge_pruned",
    graft.operators.Dml.dmlMergePruned.oracle.get) { (s, dir) =>
    graft.Tables.registerAll(s, dir)
    runMergePrunedStream(s, dir).orderBy(col("o_orderkey"))
  }

  /** STREAMING join-view maintenance: the [[graft.operators.Dml]]
    * delta rules (`dml_mv_join_delta`) driven by the real streaming
    * runtime — the view delta arrives as a file-source CDC stream (one
    * file per trigger), and each micro-batch's `foreachBatch` applies
    * (V ∖ₖ Δ) ∪ (Δ ⋈ dim) through dynamic partition overwrite, so
    * each batch rewrites ONLY the yr partitions its keys touch while
    * the fact table is never rescanned. The apply is idempotent (the
    * anti-join removes the same keys a replay would re-insert), so
    * exactly-once needs no generation guard. The final view must
    * equal the one-shot batch maintenance — any dropped or doubled
    * micro-batch breaks the key set. */
  def runMvJoinStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      import graft.operators.Dml
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream_").toString
      Dml.createMvJoinStreamTarget(s, dir)
      // three key-sliced delta files, admitted one per trigger
      val cdcDir = stagedCdcDir(s, dir, "mvjoin") {
        val delta = Dml.mvJoinBatch(Dml.mvJoinBase(s, dir))
          .withColumn("yr", lit(Dml.MvJoinYear))
        (0 until 3).map(i =>
          delta.filter(pmod(col("o_orderkey"), lit(3)) === i))
      }
      val schema = s.read.parquet(cdcDir).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(cdcDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          Dml.applyMvJoinStreamBatch(s, dir, batch)
          ()
        }
        .start()
      try q.awaitTermination() finally deleteTree(tmp)
      s.table(Dml.MvJoinStreamTarget)
        .select(col("o_orderkey"), col("o_custkey"), col("cents"),
          col("nat"))
    }

  val mvJoinStreamed: Q = Q.df(
    "stream_mv_join_delta",
    graft.operators.Dml.dmlMvJoinDelta.oracle.get) { (s, dir) =>
    graft.Tables.registerAll(s, dir)
    runMvJoinStream(s, dir).orderBy(col("o_orderkey"))
  }

  /** Execute [[sessions]] through the REAL streaming runtime. Session
    * windows are the one windowed aggregation whose streaming state
    * MERGES: an arriving event can bridge two open sessions into one,
    * so the state store does range lookups + merge-and-replace instead
    * of point upserts — a genuinely different runtime path from the
    * tumbling-window entry, worth executing, not just batch-paralleling
    * (`sessionize_events` covers that form). Complete mode re-emits the
    * fully-merged state each micro-batch; the oracle is the same
    * lag + cumulative-sum reconstruction the batch entry uses. */
  def runSessionWindowStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_")
    val outDir = s"$tmp/out"
    val q = sessions(Tables.eventsStream(s, dir))
      .writeStream
      .outputMode(OutputMode.Complete)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(outDir)
  }

  val sessionWindowStreamed: Q = Q.df(
    "stream_session_windows",
    sessionizeEvents.oracle.get) { (s, dir) =>
    runSessionWindowStream(s, dir)
      .orderBy(col("user_id"), col("session_start"))
  }

  // ---- admission-controlled scale-audit drive ----------------------------

  /** Rows per split file for the scale-audit drive. The single-file
    * fixture drains in ONE micro-batch at every scale, so the audited
    * time is runtime setup, not data (the r12 streaming rows' negative
    * slopes). Splitting events into fixed-size files and admitting one
    * file per trigger makes the micro-batch COUNT grow with the corpus
    * (1 / 3 / 25 across the shipped scales) — the audit then gates the
    * measured form of "state is watermark-bounded": per-batch time
    * flat-ish while total grows with the data. */
  val AuditRowsPerFile = 4096

  /** Recursive delete for streaming temp artifacts (shared impl). */
  private def deleteTree(root: String): Unit =
    graft.plans.Scratch.deleteTree(root)

  private val splitCache =
    new graft.plans.Memo[(SparkSession, String), String](
      path => deleteTree(
        java.nio.file.Paths.get(path).getParent.toString))

  private def splitEventsDir(s: SparkSession, dir: String): String =
    splitCache.once((s, dir)) {
      val ev = Tables.df(s, dir, "events")
      val files = math.max(1L,
        (ev.count() + AuditRowsPerFile - 1) / AuditRowsPerFile).toInt
      val out = java.nio.file.Files.createTempDirectory("graft_split_")
        .toString + "/events"
      // the split copy is written via Tables.df, so its timestamps are
      // already micros-normalized — safe for a plain readStream
      ev.repartition(files).write.parquet(out)
      out
    }

  private def splitStream(s: SparkSession, dir: String): DataFrame = {
    val split = splitEventsDir(s, dir)
    s.readStream.schema(s.read.parquet(split).schema)
      .option("maxFilesPerTrigger", "1").parquet(split)
  }

  /** Drive `name`'s streaming kernel through the real runtime under
    * admission control; returns the micro-batch count (the audit's
    * visible data term). Timing is the caller's. */
  def auditScaledStream(name: String, s: SparkSession, dir: String): Long =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_audit_")
        .toString
      val batches = new java.util.concurrent.atomic.AtomicLong(0)
      def drain(df: DataFrame, mode: OutputMode, append: Boolean): Unit = {
        val q = df.writeStream
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", s"$tmp/ckpt")
          .foreachBatch { (b: DataFrame, _: Long) =>
            batches.incrementAndGet()
            b.write.mode(if (append) "append" else "overwrite")
              .parquet(s"$tmp/out")
          }
          .start()
        // the audit only counts batches; the checkpoint + sink copy are
        // per-CALL scratch (36 calls per ScaleCurve run) — delete them
        // or repeated audits fill the temp filesystem
        try q.awaitTermination() finally deleteTree(tmp)
      }
      name match {
        case "stream_interval_join" =>
          def side(t: String): DataFrame =
            splitStream(s, dir).filter(col("event_type") === t)
          drain(intervalJoin(side("view"), side("purchase"),
            graft.operators.Temporal.RangeWindowSec),
            OutputMode.Append(), append = true)
        case "stream_static_join" =>
          val dim = broadcast(Tables.df(s, dir, "customer")
            .select(col("c_custkey"), col("c_mktsegment")))
          drain(splitStream(s, dir)
            .join(dim, col("user_id") === col("c_custkey"))
            .groupBy(col("c_mktsegment"), col("event_type"))
            .agg(count(lit(1)).as("n"), dsum(m(col("value"))).as("total")),
            OutputMode.Complete(), append = false)
        case "stream_timer_sessions" =>
          val key = "spark.sql.streaming.stateStore.providerClass"
          val prev = s.conf.getOption(key)
          s.conf.set(key, RocksDbProvider)
          try {
            val ev = splitStream(s, dir)
              .select(col("event_id"), col("ts"), col("user_id"),
                col("event_type"), col("value")).as[Event]
            drain(timerSessions(ev, gapMs = TimerSessionGapMs).toDF(),
              OutputMode.Update(), append = true)
          } finally prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
        case other => throw new IllegalArgumentException(
          s"no scaled audit drive for $other")
      }
      batches.get()
    }

  /** STREAMING segment ingestion into the STORED lexical index — the
    * batch `text_index_incremental` contract driven by the real
    * streaming runtime: the incoming corpus slice (doc_id % 10 =
    * [[graft.operators.LexIndex.BatchMod]]) arrives as a file-source
    * CDC stream admitted ONE file per trigger, and each micro-batch's
    * `foreachBatch` appends ONE lexical segment (tokenize the batch,
    * four segment-table writes — nothing corpus-sized recomputes)
    * through the replay-guarded
    * [[graft.operators.LexIndex.appendSegmentGuarded]] (the
    * [[applyMergeBatch]] high-watermark discipline). Serving reads
    * base ∪ streamed segments; integer segment statistics sum exactly,
    * so the drained index serves bit-equal to the full single-segment
    * rebuild — which is the oracle. At 100 TB this is the ingest shape
    * a live search deployment runs: micro-batches append bounded
    * segments forever, a background compaction
    * ([[graft.operators.LexIndex.mergedSegmentRoot]]'s fold) bounds
    * the segment count. */
  /** SETUP artifacts shared across invocations (memoized per (session,
    * dir), released on family drain): the pre-existing STORED base
    * index the stream appends into, and the staged name-ordered input
    * files the file source admits. Both are deterministic functions of
    * the fixture and exist BEFORE the measured operation starts — a
    * live deployment's ingest does not re-derive its base index or
    * re-mint its arriving files per micro-batch drain. Each run still
    * pays the full ingest: a run-private index root is hardlinked from
    * the base template (so the watermark + appended segments are
    * per-run) and the stream drains from a FRESH checkpoint. */
  private val streamBaseIdxCache =
    new graft.plans.Memo[(SparkSession, String), String](
      graft.plans.Scratch.deleteTree)

  private def streamBaseIdx(s: SparkSession, dir: String): String =
    streamBaseIdxCache.once((s, dir)) {
      val root = java.nio.file.Files
        .createTempDirectory("graft_streamidx_base_").toString
      import graft.operators.LexIndex
      LexIndex.writeSegment(
        graft.Tables.df(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 10 =!= LexIndex.BatchMod), root, "base")
      root
    }

  /** Stage `src` rows as 3 name-ordered single-file slices (sub-sliced
    * by `id div 10 mod 3`) under a memoized dir — the arriving-files
    * fixture every admission-controlled stream run re-reads. */
  private val stagedSliceCache =
    new graft.plans.Memo[(SparkSession, String, String), String](
      graft.plans.Scratch.deleteTree)

  private def stagedSlices(s: SparkSession, dir: String, table: String,
      idCol: String, batchMod: Int): String =
    // the staged content depends on (idCol, batchMod) too — keying them
    // keeps a future caller staging the same table with different
    // parameters from silently reusing the wrong files
    stagedSliceCache.once((s, dir, s"$table/$idCol/$batchMod")) {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_staged_${table}_").toString
      try {
        val inDir = s"$tmp/in"
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
        val src = graft.Tables.df(s, dir, table)
        (0 until 3).foreach { i =>
          val stage = s"$tmp/stage$i"
          src.filter(col(idCol) % 10 === batchMod &&
              pmod(expr(s"$idCol div 10"), lit(3)) === i)
            .coalesce(1).write.parquet(stage)
          val part = new java.io.File(stage).listFiles()
            .find(f => f.getName.endsWith(".parquet"))
            .getOrElse(sys.error(
              s"staged slice $i of $table: no parquet part in $stage"))
          java.nio.file.Files.move(part.toPath,
            java.nio.file.Paths.get(s"$inDir/b$i.parquet"))
        }
        // memo value is the PARENT so the release deletes the whole
        // staging tree (stage$i husks included), not just the in/ dir
        tmp
      } catch {
        case e: Throwable => graft.plans.Scratch.deleteTree(tmp); throw e
      }
    } + "/in"

  def runIndexAppendStream(s: SparkSession, dir: String): DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      import graft.operators.LexIndex
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream_").toString
      val idx = s"$tmp/idx"
      graft.plans.Scratch.linkTree(streamBaseIdx(s, dir), idx)
      val inDir = stagedSlices(s, dir, "documents", "doc_id",
        LexIndex.BatchMod)
      val schema = s.read.parquet(inDir).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, bid: Long) =>
          LexIndex.appendSegmentGuarded(s, idx, batch, bid)
          ()
        }
        .start()
      q.awaitTermination()
      LexIndex.serveBm25(s, idx, LexIndex.segmentsOf(idx))
    }

  /** STREAMING segment ingestion for the stored IVF-SQ8 index — the
    * [[runIndexAppendStream]] discipline on the VECTOR family: the
    * incoming embedding slice (vec_id % 10 =
    * [[graft.operators.Similarity.AnnBatchMod]]) arrives one file per
    * trigger; each micro-batch encodes against the FROZEN stored
    * base-trained centroids into its own cell-partitioned delta
    * segment (replay-guarded batch-id high-watermark — per-batch work
    * is one encode pass over the batch, nothing corpus-sized); the
    * drained serve unions base ∪ segments through the probed-cell-
    * pruned serve. Entry + oracle live at
    * [[graft.operators.Similarity.annIvfSqStream]]. */
  def runAnnAppendStream(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    withStreamPartitions(s) {
      import org.apache.spark.sql.streaming.Trigger
      import graft.operators.Similarity
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_stream_").toString
      val root = Similarity.ivfsqBaseRoot(s, dir)
      val cm = Similarity.readCentroids(s, root)
      Similarity.noteIvfSqBaseCm(cm)
      val emb = graft.Tables.df(s, dir, "embeddings")
      val inDir = stagedSlices(s, dir, "embeddings", "vec_id",
        Similarity.AnnBatchMod)
      val schema = s.read.parquet(inDir).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (b: DataFrame, bid: Long) =>
          // replay guard: the applyMergeBatch high-watermark idiom —
          // a replayed batch id never re-encodes
          val wmPath = java.nio.file.Paths.get(s"$tmp/delta_watermark")
          val wm =
            if (java.nio.file.Files.exists(wmPath))
              java.nio.file.Files.readString(wmPath).trim.toLong
            else -1L
          if (bid > wm) {
            Similarity.ivfSqEncode(b, cm)
              .write.mode("overwrite").partitionBy("cid")
              .parquet(s"$tmp/delta/b$bid")
            java.nio.file.Files.writeString(wmPath, bid.toString)
          }
          ()
        }
        .start()
      q.awaitTermination()
      val deltaDirs = Option(new java.io.File(s"$tmp/delta").listFiles())
        .toSeq.flatten.filter(_.isDirectory).map(_.getPath).sorted
      val codes = (Seq(s"$root/codes") ++ deltaDirs)
        .map(d => s.read.parquet(d))
        .reduce(_ unionByName _)
      Similarity.ivfSqServe(emb, Similarity.TopK, cm, codes,
        unitOpt = Some(Similarity.sharedUnitVecs(s, dir)))
    }

  val indexAppendStreamed: Q = Q.df(
    "stream_index_append", graft.operators.LexIndex.serveOracle) {
    (s, dir) => runIndexAppendStream(s, dir)
  }

  val queries: Seq[Q] =
    Seq(sessionizeEvents, sessionDynamicGap, watermarkLateness,
      hourlyCountsStreamed, dedupStreamed, userActivityState,
      transformWithStateQ, timerSessionsStreamed, staticJoinStreamed,
      mergeUpsertStreamed, mergePrunedStreamed, mvJoinStreamed,
      intervalJoinStreamed, intervalJoinOuterStreamed,
      intervalJoinFullStreamed, intervalJoinRightStreamed,
      intervalJoinSemiStreamed,
      customSourceStreamed, sessionWindowStreamed, indexAppendStreamed)
}
