package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Event-stream product analytics — the OLAP workloads a clickstream
  * warehouse runs hourly at fact-table scale: ordered conversion
  * funnels and cohort retention. Both are pure aggregations/joins on
  * the user key (well-distributed shuffles, partial aggregation,
  * no driver-side state) and integer/date arithmetic end-to-end, so
  * both are exactly oracle-checked.
  */
object Analytics {

  /** Ordered three-stage funnel view → click → purchase: a user
    * converts a stage only with an event STRICTLY AFTER their previous
    * stage's first event (the ordering constraint that separates a
    * funnel from three independent counts). Each stage is one
    * filter + groupBy-min on user_id, then left joins assemble the
    * per-user funnel row — at fact scale: three partial-aggregated
    * shuffles on the user key and two user-key joins, no window over
    * the full event stream. */
  def funnelConversion(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = events.filter(col("event_type") === "click").as("e")
      .join(v, Seq("user_id"))
      .filter(col("e.ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("e.ts")).as("t_click"))
    val p = events.filter(col("event_type") === "purchase").as("e")
      .join(c, Seq("user_id"))
      .filter(col("e.ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("e.ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, lit(3L))
          .when(col("t_click").isNotNull, lit(2L))
          .otherwise(lit(1L)).as("stage"))
  }

  val eventsFunnel: Q = Q.df(
    "events_funnel_conversion",
    """with v as (select user_id, min(ts) as t_view from events
      |           where event_type = 'view' group by 1),
      |c as (select e.user_id, min(e.ts) as t_click
      |      from events e join v using (user_id)
      |      where e.event_type = 'click' and e.ts > v.t_view group by 1),
      |p as (select e.user_id, min(e.ts) as t_purchase
      |      from events e join c using (user_id)
      |      where e.event_type = 'purchase' and e.ts > c.t_click group by 1)
      |select v.user_id, v.t_view, c.t_click, p.t_purchase,
      |  cast(case when p.t_purchase is not null then 3
      |            when c.t_click is not null then 2
      |            else 1 end as bigint) as stage
      |from v left join c using (user_id) left join p using (user_id)
      |order by user_id""".stripMargin) { (s, dir) =>
    funnelConversion(Tables.df(s, dir, "events")).orderBy(col("user_id"))
  }

  /** Cohort retention: users grouped by their first-activity day, then
    * distinct active users per (cohort day, day offset) — the retention
    * triangle. One groupBy-min for cohort assignment, one broadcastable
    * user→cohort join (users are always a tiny fraction of events),
    * one count-distinct aggregation; all date arithmetic is integer
    * days. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val cohort = events.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), to_date(col("ts")).as("active_day"))
      .join(cohort, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).cast("long")
          .as("day_offset"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  val eventsCohort: Q = Q.df(
    "events_cohort_retention",
    """with cohort as (select user_id, cast(min(ts) as date) as cohort_day
      |                from events group by 1)
      |select c.cohort_day,
      |  cast(date_diff('day', c.cohort_day, cast(e.ts as date)) as bigint)
      |    as day_offset,
      |  count(distinct e.user_id) as n_users
      |from events e join cohort c using (user_id)
      |group by 1, 2
      |order by cohort_day, day_offset""".stripMargin) { (s, dir) =>
    cohortRetention(Tables.df(s, dir, "events"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Event-type transition bigrams: per user, events ordered by time
    * form a path; adjacent (src → dst) hops are counted corpus-wide —
    * the first-order Markov view behind "where do users go next"
    * analyses. One window keyed on user_id (a user's events are one
    * state shard; the shuffle is the same user-key exchange the funnel
    * uses) followed by a tiny groupBy on the type pair — at fact scale
    * the output is |event types|², independent of row count. */
  def transitionBigrams(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"),
        lag(col("event_type"), 1).over(w).as("src"),
        col("event_type").as("dst"))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
  }

  val eventsPaths: Q = Q.df(
    "events_user_paths",
    """with hops as (
      |  select user_id,
      |    lag(event_type) over (partition by user_id
      |                          order by ts, event_id) as src,
      |    event_type as dst
      |  from events)
      |select src, dst, count(*) as n
      |from hops where src is not null
      |group by src, dst
      |order by n desc, src, dst""".stripMargin) { (s, dir) =>
    transitionBigrams(Tables.df(s, dir, "events"))
      .orderBy(col("n").desc, col("src"), col("dst"))
  }

  /** Per-type daily volume anomalies: a (type, day) cell is a spike when
    * its count exceeds the type's mean by more than two standard
    * deviations. The test is evaluated in EXACT integer arithmetic via
    * power sums — (c·n − S1)² > 4·(n·S2 − S1²) with S1 = Σc, S2 = Σc² —
    * the [[graft.operators.Relational]] agg_stats_moments trick, so no
    * float variance ever enters the compare (at petabyte counts, swap
    * long for DecimalType power sums; the shape is unchanged). Daily
    * counts partial-aggregate map-side; the per-type stats frame is
    * |types| rows and broadcasts. */
  def anomalySpikes(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
      sum(col("cnt") * col("cnt")).as("s2"))
    val dev = col("cnt") * col("n") - col("s1")
    daily.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("day"), col("cnt"),
        (dev > 0 && dev * dev > lit(4L) * (col("n") * col("s2")
          - col("s1") * col("s1"))).as("is_spike"))
  }

  val eventsAnomaly: Q = Q.df(
    "events_anomaly_spikes",
    """with daily as (
      |  select event_type, cast(ts as date) as day,
      |    cast(count(*) as bigint) as cnt
      |  from events group by event_type, cast(ts as date)),
      |stats as (
      |  select event_type, cast(count(*) as bigint) as n,
      |    cast(sum(cnt) as bigint) as s1,
      |    cast(sum(cnt * cnt) as bigint) as s2
      |  from daily group by event_type)
      |select daily.event_type, day, cnt,
      |  (cnt * n - s1 > 0 and
      |   (cnt * n - s1) * (cnt * n - s1) > 4 * (n * s2 - s1 * s1)) as is_spike
      |from daily join stats on daily.event_type = stats.event_type
      |order by daily.event_type, day""".stripMargin) { (s, dir) =>
    anomalySpikes(Tables.df(s, dir, "events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** RFM (recency / frequency / monetary) user segmentation over
    * purchase events — the standard behavioral-cohort op. Each user's
    * quartile per dimension comes from comparing against the corpus's
    * exact percentile_disc thresholds (a 9-value aggregate broadcast
    * back), NOT a global ntile window: a total-order window over all
    * users is a single-partition sort at scale, while threshold-compare
    * is one agg + a broadcast join — the same shape at 150 users or
    * 1e9. Monetary sums in exact decimal cents, so every compared value
    * is an exact integer/decimal in both engines. Recency counts days
    * from the stream's max date (smaller = better, so quartile 1 is the
    * most recent). */
  def rfmSegments(events: DataFrame): DataFrame = {
    import graft.functions.Money
    val p = events.filter(col("event_type") === "purchase")
    val maxDay = p.agg(to_date(max(col("ts"))).as("d1"))
    val rfm = p.groupBy(col("user_id"))
      .agg(
        to_date(max(col("ts"))).as("last_day"),
        count(lit(1)).as("f"),
        sum((Money.m(col("value")) * 100).cast("long")).as("m_cents"))
      .crossJoin(broadcast(maxDay))
      .select(col("user_id"),
        datediff(col("d1"), col("last_day")).cast("long").as("r_days"),
        col("f"), col("m_cents"))
    val thr = rfm.agg(
      expr("percentile_disc(0.25) within group (order by r_days)").as("r25"),
      expr("percentile_disc(0.5)  within group (order by r_days)").as("r50"),
      expr("percentile_disc(0.75) within group (order by r_days)").as("r75"),
      expr("percentile_disc(0.25) within group (order by f)").as("f25"),
      expr("percentile_disc(0.5)  within group (order by f)").as("f50"),
      expr("percentile_disc(0.75) within group (order by f)").as("f75"),
      expr("percentile_disc(0.25) within group (order by m_cents)").as("m25"),
      expr("percentile_disc(0.5)  within group (order by m_cents)").as("m50"),
      expr("percentile_disc(0.75) within group (order by m_cents)").as("m75"))
    def quartile(v: org.apache.spark.sql.Column, q25: String, q50: String,
        q75: String) =
      (lit(1L) + (v > col(q25)).cast("long") + (v > col(q50)).cast("long")
        + (v > col(q75)).cast("long"))
    rfm.crossJoin(broadcast(thr))
      .select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
        quartile(col("r_days"), "r25", "r50", "r75").as("r_q"),
        quartile(col("f"), "f25", "f50", "f75").as("f_q"),
        quartile(col("m_cents"), "m25", "m50", "m75").as("m_q"))
  }

  val eventsRfm: Q = Q.df(
    "events_rfm_segments", {
      val mCents = s"cast(${graft.functions.Money.sqlM("value")} * 100 as bigint)"
      s"""with p as (select * from events where event_type = 'purchase'),
         |rfm as (
         |  select user_id,
         |    cast(datediff('day', max(cast(ts as date)),
         |      (select max(cast(ts as date)) from p)) as bigint) as r_days,
         |    cast(count(*) as bigint) as f,
         |    cast(sum($mCents) as bigint) as m_cents
         |  from p group by user_id),
         |thr as (
         |  select
         |    percentile_disc(0.25) within group (order by r_days) as r25,
         |    percentile_disc(0.5)  within group (order by r_days) as r50,
         |    percentile_disc(0.75) within group (order by r_days) as r75,
         |    percentile_disc(0.25) within group (order by f) as f25,
         |    percentile_disc(0.5)  within group (order by f) as f50,
         |    percentile_disc(0.75) within group (order by f) as f75,
         |    percentile_disc(0.25) within group (order by m_cents) as m25,
         |    percentile_disc(0.5)  within group (order by m_cents) as m50,
         |    percentile_disc(0.75) within group (order by m_cents) as m75
         |  from rfm)
         |select user_id, r_days, f, m_cents,
         |  1 + cast(r_days > r25 as bigint) + cast(r_days > r50 as bigint)
         |    + cast(r_days > r75 as bigint) as r_q,
         |  1 + cast(f > f25 as bigint) + cast(f > f50 as bigint)
         |    + cast(f > f75 as bigint) as f_q,
         |  1 + cast(m_cents > m25 as bigint) + cast(m_cents > m50 as bigint)
         |    + cast(m_cents > m75 as bigint) as m_q
         |from rfm cross join thr
         |order by user_id""".stripMargin
    }) { (s, dir) =>
    rfmSegments(Tables.df(s, dir, "events")).orderBy(col("user_id"))
  }

  /** DAU / WAU — daily and trailing-7-day distinct active users, the
    * engagement series every event pipeline publishes. The corpus first
    * collapses to distinct (user, day) pairs (map-side combinable, the
    * only fact-scale pass); WAU then replicates each pair to the ≤ 7
    * window days it supports via a broadcast of the day dimension —
    * shuffle is 7× the user-day pairs, never the raw event stream, and
    * no distinct-over-window state. */
  def activeUsers(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val days = ud.select(col("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud.as("u")
      .join(broadcast(days.as("d")),
        col("u.day").between(date_sub(col("d.day"), 6), col("d.day")))
      .groupBy(col("d.day").as("day"))
      .agg(countDistinct(col("u.user_id")).as("wau"))
    dau.join(wau, Seq("day"))
  }

  val eventsActiveUsers: Q = Q.df(
    "events_active_users",
    """with ud as (select distinct user_id, cast(ts as date) as day
      |            from events),
      |days as (select distinct day from ud),
      |dau as (select day, cast(count(*) as bigint) as dau
      |        from ud group by day),
      |wau as (select d.day, cast(count(distinct u.user_id) as bigint) as wau
      |        from ud u join days d
      |          on u.day between d.day - interval 6 day and d.day
      |        group by d.day)
      |select dau.day, dau.dau, wau.wau
      |from dau join wau on dau.day = wau.day
      |order by dau.day""".stripMargin) { (s, dir) =>
    activeUsers(Tables.df(s, dir, "events")).orderBy(col("day"))
  }

  /** Attribution-window funnel — the production form of
    * [[funnelConversion]]: a stage converts only within a bounded window
    * of the previous stage (click ≤ 2 days after first view, purchase
    * ≤ 5 days after that click), because an unbounded funnel
    * credits conversions that had nothing to do with the entry event.
    * Same scale shape as the unbounded form (stage filters + groupBy-min
    * on the user key); the window bound is one more predicate in each
    * stage join, evaluated with identical timestamp-interval arithmetic
    * in both engines. */
  def funnelWindowed(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = events.filter(col("event_type") === "click").as("e")
      .join(v, Seq("user_id"))
      .filter(col("e.ts") > col("t_view") &&
        col("e.ts") <= col("t_view") + expr("interval 2 days"))
      .groupBy(col("user_id")).agg(min(col("e.ts")).as("t_click"))
    val p = events.filter(col("event_type") === "purchase").as("e")
      .join(c, Seq("user_id"))
      .filter(col("e.ts") > col("t_click") &&
        col("e.ts") <= col("t_click") + expr("interval 5 days"))
      .groupBy(col("user_id")).agg(min(col("e.ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"),
        when(col("t_purchase").isNotNull, lit(3L))
          .when(col("t_click").isNotNull, lit(2L))
          .otherwise(lit(1L)).as("stage"))
  }

  val eventsFunnelWindowed: Q = Q.df(
    "events_funnel_windowed",
    """with v as (select user_id, min(ts) as t_view from events
      |           where event_type = 'view' group by 1),
      |c as (select e.user_id, min(e.ts) as t_click
      |      from events e join v using (user_id)
      |      where e.event_type = 'click' and e.ts > v.t_view
      |        and e.ts <= v.t_view + interval 2 day group by 1),
      |p as (select e.user_id, min(e.ts) as t_purchase
      |      from events e join c using (user_id)
      |      where e.event_type = 'purchase' and e.ts > c.t_click
      |        and e.ts <= c.t_click + interval 5 day group by 1)
      |select v.user_id, v.t_view, c.t_click, p.t_purchase,
      |  cast(case when p.t_purchase is not null then 3
      |            when c.t_click is not null then 2
      |            else 1 end as bigint) as stage
      |from v left join c using (user_id) left join p using (user_id)
      |order by user_id""".stripMargin) { (s, dir) =>
    funnelWindowed(Tables.df(s, dir, "events")).orderBy(col("user_id"))
  }

  /** Winsorized (percentile-clipped) metric values — the standard
    * outlier treatment before a numeric column feeds a model or a
    * dashboard aggregate: clip each event's value into its own event
    * type's [p05, p95]. percentile_disc picks an ACTUAL data element
    * (no interpolation arithmetic), so the bounds — and therefore the
    * clipped values, which are just two comparisons — are bit-exact
    * cross-engine on raw doubles.
    *
    * Scale shape: the bounds table is |event_types| rows (a sort-based
    * aggregate per type, partial-aggregated per partition), and the
    * attach joining it back is a broadcast — the event-sized side never
    * shuffles. At 100 TB the exact within-group sort gives way to
    * approx_percentile with the same two-comparison clip; the entry
    * pins the exact semantics the approximation is graded against. */
  val eventsWinsorize: Q = Q.shared(
    "events_winsorize",
    """with b as (
      |  select event_type,
      |    percentile_disc(0.05) within group (order by value) as lo,
      |    percentile_disc(0.95) within group (order by value) as hi
      |  from events group by event_type)
      |select e.event_id, e.event_type, e.value,
      |  least(greatest(e.value, b.lo), b.hi) as clipped,
      |  (e.value < b.lo or e.value > b.hi) as was_clipped
      |from events e join b on e.event_type = b.event_type
      |order by e.event_id""".stripMargin)

  /** Running DISTINCT count over an ordered window — cumulative unique
    * users per event type by day. The oracle uses DuckDB's native
    * `count(distinct …) over`; Spark has no distinct window aggregate,
    * so the engine side is the SCALABLE rewrite: mark each user's FIRST
    * appearance with one row_number window on (type, user), reduce to
    * per-day new-user counts, and running-sum those — the distinct-ness
    * state that a naive distinct-window would carry per frame becomes a
    * one-pass dedup, and every window partition after the reduction is
    * |days| rows, not |events|. This is the rewrite a 100 TB cumulative-
    * uniques query needs regardless of engine. */
  val eventsDistinctRunning: Q = Q.df(
    "window_distinct_running",
    """with d as (select distinct event_type, cast(ts as date) as day,
      |    user_id from events),
      |w as (select event_type, day, cast(count(distinct user_id) over
      |    (partition by event_type order by day) as bigint) as cum_users
      |  from d)
      |select distinct event_type, cast(day as varchar) as day, cum_users
      |from w order by event_type, day""".stripMargin) { (s, dir) =>
    val d = Tables.df(s, dir, "events")
      .select(col("event_type"), col("ts").cast("date").cast("string")
        .as("day"), col("user_id"))
      .distinct()
    val firsts = d
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("day"))))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("new_users"))
    d.select(col("event_type"), col("day")).distinct()
      .join(firsts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))))
      .select(col("event_type"), col("day"), col("cum_users"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Robust outlier detection by median absolute deviation — the spike
    * detector's heavy-tail-safe sibling (mean/stddev z-scores are
    * themselves dragged by the outliers they hunt; the median/MAD pair
    * has a 50% breakdown point). Flags values beyond 3 MADs of their
    * event-type median.
    *
    * Cross-engine exactness: percentile_disc picks an ACTUAL element
    * (no interpolation), |value − med| and the 3·mad threshold are
    * single IEEE ops per row, and the output is a count — no float
    * summation anywhere. Distributed shape: two sort-based aggregates
    * per event_type plus one broadcastable |types|-sized join per pass;
    * nothing driver-side. */
  val eventsMadOutliers: Q = Q.shared(
    "events_mad_outliers",
    """with med as (
      |  select event_type,
      |    percentile_disc(0.5) within group (order by value) as med
      |  from events group by event_type),
      |dev as (
      |  select e.event_type, e.value, abs(e.value - m.med) as adev
      |  from events e join med m on m.event_type = e.event_type),
      |mad as (
      |  select event_type,
      |    percentile_disc(0.5) within group (order by adev) as mad
      |  from dev group by event_type)
      |select d.event_type, count(*) as n_events,
      |  cast(sum(case when d.adev > 3.0 * m.mad then 1 else 0 end)
      |    as bigint) as n_outliers
      |from dev d join mad m on m.event_type = d.event_type
      |group by d.event_type
      |order by d.event_type""".stripMargin)

  /** Attribution lookback window in microseconds (7 days). */
  val AttribWindowUs = 7L * 24 * 3600 * 1000000L

  /** Marketing attribution: every purchase credits the user's clicks in
    * the trailing 7-day window — last-touch (most recent click) and
    * first-touch (earliest click in window), the two bookend models.
    * "Campaign" is the click's props.k mod 5; purchases with no click
    * in window report as campaign −1 (organic).
    *
    * Shape: one user-partitioned RANGE window over the interleaved
    * click/purchase stream does both models in a single pass — the
    * AS-OF-join pattern (Temporal.asof) without materializing a join:
    * state per task is the window frame, never the user's history ×
    * purchases. Ordering key is epoch micros ((user_id, ts) is unique
    * in the fixture, checked at all scales), frame arithmetic is exact
    * int64. Revenue sums in exact decimal cents. */
  val eventsAttribution: Q = Q.df(
    "events_attribution", {
      val frame = s"range between $AttribWindowUs preceding and current row"
      s"""with mixed as (
         |  select user_id, ts, event_type, value,
         |    case when event_type = 'click'
         |      then cast(json_extract(props, '$$.k') as bigint) % 5
         |    end as camp
         |  from events where event_type in ('click', 'purchase')),
         |scored as (
         |  select *,
         |    last_value(camp ignore nulls) over (
         |      partition by user_id order by epoch_us(ts) $frame) as lt,
         |    first_value(camp ignore nulls) over (
         |      partition by user_id order by epoch_us(ts) $frame) as ft
         |  from mixed),
         |p as (select coalesce(lt, -1) as lt, coalesce(ft, -1) as ft,
         |        cast(${graft.functions.Money.sqlM("value")} * 100 as bigint)
         |          as cents
         |      from scored where event_type = 'purchase'),
         |l as (select lt as campaign, count(*) as lt_purchases,
         |        cast(sum(cents) as bigint) as lt_rev_cents from p group by lt),
         |f as (select ft as campaign, count(*) as ft_purchases
         |      from p group by ft)
         |select coalesce(l.campaign, f.campaign) as campaign,
         |  coalesce(lt_purchases, 0) as lt_purchases,
         |  coalesce(lt_rev_cents, 0) as lt_rev_cents,
         |  coalesce(ft_purchases, 0) as ft_purchases
         |from l full join f on l.campaign = f.campaign
         |order by campaign""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Money
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-AttribWindowUs, 0L)
    val mixed = Tables.df(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        when(col("event_type") === "click",
          get_json_object(col("props"), "$.k").cast("long") % 5).as("camp"))
    val scored = mixed
      .withColumn("lt", last(col("camp"), ignoreNulls = true).over(w))
      .withColumn("ft", first(col("camp"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("lt"), lit(-1L)).as("lt"),
        coalesce(col("ft"), lit(-1L)).as("ft"),
        (Money.m(col("value")) * 100).cast("long").as("cents"))
    val lastTouch = scored.groupBy(col("lt").as("campaign"))
      .agg(count(lit(1)).as("lt_purchases"),
        sum("cents").as("lt_rev_cents"))
    val firstTouch = scored.groupBy(col("ft").as("campaign"))
      .agg(count(lit(1)).as("ft_purchases"))
    lastTouch.join(firstTouch, Seq("campaign"), "full")
      .select(col("campaign"),
        coalesce(col("lt_purchases"), lit(0L)).as("lt_purchases"),
        coalesce(col("lt_rev_cents"), lit(0L)).as("lt_rev_cents"),
        coalesce(col("ft_purchases"), lit(0L)).as("ft_purchases"))
      .orderBy(col("campaign"))
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences: for every observed (state → next-state) pair, the count
    * and the row-normalized transition probability. The behavioral-model
    * input every session-analysis / next-action-prediction pipeline
    * derives first. One lead() window keyed on user (a single shuffle of
    * the fact table, deterministic (ts, event_id) ordering), then two
    * map-side-combined aggregations on the |types|²-bounded pair space;
    * probabilities are rounded per the float-determinism contract. */
  val eventsTransitions: Q = Q.df(
    "events_transition_matrix",
    """with s as (select user_id, event_type,
      |    lead(event_type) over (partition by user_id
      |                           order by ts, event_id) as nxt
      |  from events),
      |t as (select event_type as src, nxt as dst,
      |        cast(count(*) as bigint) as n
      |      from s where nxt is not null group by event_type, nxt),
      |tot as (select src, cast(sum(n) as bigint) as tn from t group by src)
      |select t.src, t.dst, t.n,
      |  round(cast(t.n as double) / cast(tot.tn as double), 6) as p
      |from t join tot using (src)
      |order by src, dst""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val t = Tables.df(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("n"))
    val tot = t.groupBy("src").agg(sum("n").as("tn"))
    t.join(broadcast(tot), "src")
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") / col("tn").cast("double"), 6)
          .as("p"))
      .orderBy(col("src"), col("dst"))
  }

  /** Sequence-pattern matching over per-user event paths — the
    * MATCH_RECOGNIZE-shaped question ("which users did view → … →
    * click → … → purchase, in that order?") answered by building each
    * user's ordered type path once and applying an ordinary regex.
    * One groupBy shuffle on the user key; the path array is bounded by
    * per-user event count (at 100 TB the same query runs per SESSION
    * after [[graft.streaming.EventsStream.sessions]], which bounds the
    * string by the session gap, not user lifetime). array_sort on
    * (ts, event_id) structs makes the order deterministic under any
    * partitioning; the regex is codegen'd RLIKE, no UDF. */
  val eventsPathPattern: Q = Q.df(
    "events_path_pattern",
    """with p as (select user_id,
      |    count(*) as n_events,
      |    string_agg(event_type, '>' order by ts, event_id) as path
      |  from events group by user_id)
      |select user_id, cast(n_events as bigint) as n_events,
      |  regexp_matches(path, 'view.*click.*purchase') as converted
      |from p order by user_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ">").as("path"))
      .select(col("user_id"), col("n_events"),
        col("path").rlike("view.*click.*purchase").as("converted"))
      .orderBy(col("user_id"))
  }

  /** Gaps-and-islands: per-user longest consecutive-day activity streak
    * and streak count — the engagement metric behind "N-day streak"
    * features and retention-risk scoring. The classic island key
    * `day - row_number days` is constant exactly within a consecutive
    * run; the window is partitioned per user (no global sort) and the
    * two aggregations above it are map-side combinable. Integer/date
    * arithmetic end-to-end. */
  val eventsStreaks: Q = Q.df(
    "events_activity_streaks",
    """with d as (select distinct user_id, cast(ts as date) as day
      |           from events),
      |i as (select user_id, day,
      |    day - cast(row_number() over (partition by user_id
      |          order by day) as int) as isl
      |  from d),
      |s as (select user_id, isl, cast(count(*) as bigint) as len
      |      from i group by user_id, isl)
      |select user_id, cast(max(len) as bigint) as max_streak,
      |  cast(count(*) as bigint) as n_streaks
      |from s group by user_id order by user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d = Tables.df(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    d.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("day"))))
      .withColumn("isl", date_sub(col("day"), col("rn")))
      .groupBy(col("user_id"), col("isl"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("max_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"))
  }

  /** Single mean-shift changepoint per event type (binary segmentation's
    * first split, the Pettitt-style alternative to [[eventsAnomaly]]'s
    * per-day spikes): over each type's daily-count series, every split
    * point i is scored |mean(1..i) − mean(i+1..n)| · √(i(n−i)/n) — the
    * standardized two-sample mean difference — and the argmax is the
    * detected break. A spike is one outlying day; a changepoint is a
    * LEVEL change (deploy, pricing change, bot onset) that a spike rule
    * never fires on.
    *
    * Scale shape: one running-sum window and one argmax window per
    * type — state bounded by a series, no global sort, no iteration.
    * Means derive from exact integer prefix sums; both engines evaluate
    * the identical double formula (IEEE division/sqrt are correctly
    * rounded), so the argmax ordering agrees and only the surface is
    * rounded. Ties break on the earlier day. */
  def changepoints(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val whole = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("i", row_number().over(byDay).cast("long"))
      .withColumn("pre",
        sum(col("cnt")).over(byDay.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("tot", sum(col("cnt")).over(whole))
      .filter(col("i") < col("n"))
      .withColumn("mb", col("pre").cast("double") / col("i").cast("double"))
      .withColumn("ma", (col("tot") - col("pre")).cast("double")
        / (col("n") - col("i")).cast("double"))
      .withColumn("score", abs(col("mb") - col("ma"))
        * sqrt((col("i") * (col("n") - col("i"))).cast("double")
          / col("n").cast("double")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("score").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        round(col("mb"), 6).as("mean_before"),
        round(col("ma"), 6).as("mean_after"),
        round(col("score"), 6).as("score"))
  }

  val eventsChangepoint: Q = Q.df(
    "events_changepoint",
    """with daily as (
      |  select event_type, cast(ts as date) as day,
      |    cast(count(*) as bigint) as cnt
      |  from events group by event_type, cast(ts as date)),
      |ord as (
      |  select event_type, day, cnt,
      |    cast(row_number() over (partition by event_type order by day)
      |      as bigint) as i,
      |    sum(cnt) over (partition by event_type order by day
      |      rows between unbounded preceding and current row) as pre,
      |    cast(count(*) over (partition by event_type) as bigint) as n,
      |    sum(cnt) over (partition by event_type) as tot
      |  from daily),
      |scored as (
      |  select event_type, day,
      |    cast(pre as double) / cast(i as double) as mb,
      |    cast(tot - pre as double) / cast(n - i as double) as ma,
      |    abs(cast(pre as double) / cast(i as double)
      |      - cast(tot - pre as double) / cast(n - i as double))
      |      * sqrt(cast(i * (n - i) as double) / cast(n as double)) as score
      |  from ord where i < n)
      |select event_type, day as change_day,
      |  round(mb, 6) as mean_before, round(ma, 6) as mean_after,
      |  round(score, 6) as score
      |from (select *, row_number() over (partition by event_type
      |        order by score desc, day) as rk from scored) t
      |where rk = 1 order by event_type""".stripMargin) { (s, dir) =>
    changepoints(Tables.df(s, dir, "events")).orderBy(col("event_type"))
  }

  /** Day-of-week seasonality profile + seasonally-adjusted series: each
    * (type, day) count minus its type's mean for that WEEKDAY — the
    * de-seasonalization step before trend/anomaly work on traffic with
    * a weekly rhythm. The profile is a |types|×7-row broadcast
    * aggregate; adjustment is one broadcast join back onto the daily
    * series. Means are exact-integer sums over exact counts divided
    * once — the same cross-engine double contract as
    * [[eventsChangepoint]]. dayofweek is ISO (1=Monday) in both
    * engines via the shared isodow/ISO expression. */
  def seasonality(events: DataFrame): DataFrame = {
    // daily feeds the profile AND the adjusted output — materialize so
    // the events scan runs once, not once per consumer
    val daily = graft.plans.Checkpoints.materialize(events
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", expr("extract(dayofweek_iso from day)").cast("long")))
    val profile = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("cnt")).as("s"), count(lit(1)).as("n"))
      .select(col("event_type"), col("dow"),
        (col("s").cast("double") / col("n").cast("double")).as("dow_mean"))
    val out = graft.plans.Checkpoints.materialize(
      daily.join(broadcast(profile), Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("cnt"),
          round(col("dow_mean"), 6).as("dow_mean"),
          round(col("cnt").cast("double") - col("dow_mean"), 6)
            .as("adjusted")))
    graft.plans.Checkpoints.free(daily)
    out
  }

  val eventsSeasonality: Q = Q.df(
    "events_seasonality",
    """with daily as (
      |  select event_type, cast(ts as date) as day,
      |    cast(count(*) as bigint) as cnt
      |  from events group by event_type, cast(ts as date)),
      |d2 as (select *, cast(isodow(day) as bigint) as dow from daily),
      |profile as (
      |  select event_type, dow,
      |    cast(sum(cnt) as double) / cast(count(*) as double) as dow_mean
      |  from d2 group by event_type, dow)
      |select d2.event_type, day, cnt,
      |  round(dow_mean, 6) as dow_mean,
      |  round(cast(cnt as double) - dow_mean, 6) as adjusted
      |from d2 join profile using (event_type, dow)
      |order by event_type, day""".stripMargin) { (s, dir) =>
    seasonality(Tables.df(s, dir, "events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** A/B lift readout — the experiment-analysis primitive: users split
    * into control/treatment by a deterministic hash of user_id (the
    * assignment every experimentation platform derives, reproducible
    * across reruns), per-user purchase counts compared between arms.
    * Output per event type: arm means, absolute lift, relative lift,
    * and the z-statistic from the two-sample variance — all from five
    * exact integer sums per (type, arm), one map-side-combined
    * aggregation over the fact table, divided/rooted once at the
    * surface (the cross-engine double contract). */
  def abLift(events: DataFrame): DataFrame = {
    // Arm = HIGH bit of the 32-bit Knuth hash. The low bit would reduce
    // to user_id parity (the multiplier is odd, and mod-2 commutes with
    // it), silently confounding any even/odd id-allocation pattern;
    // multiplicative hashing mixes into the HIGH bits. user_id is
    // reduced mod 2^31 first so the product stays < 2^63 — exact int64
    // in both engines at any id magnitude (no silent Spark wrap /
    // DuckDB overflow divergence).
    val perUser = events
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .withColumn("arm",
        when(((col("user_id") % lit(2147483648L)) * lit(2654435761L))
          % lit(4294967296L) >= lit(2147483648L), 1L).otherwise(0L))
    // the |types|×2-row arm table feeds both the control and treatment
    // sides; materialize so the fact-table aggregation runs once
    val arms = graft.plans.Checkpoints.materialize(
      perUser.groupBy(col("event_type"), col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2")))
    val c = arms.filter(col("arm") === 0)
      .select(col("event_type"), col("n").as("nc"), col("s1").as("sc"),
        col("s2").as("qc"))
    val t = arms.filter(col("arm") === 1)
      .select(col("event_type"), col("n").as("nt"), col("s1").as("st"),
        col("s2").as("qt"))
    val out = c.join(t, Seq("event_type"))
      .select(col("event_type"), col("nc"), col("nt"),
        round(col("sc").cast("double") / col("nc").cast("double"), 6)
          .as("mean_c"),
        round(col("st").cast("double") / col("nt").cast("double"), 6)
          .as("mean_t"),
        round(col("st").cast("double") / col("nt").cast("double")
          - col("sc").cast("double") / col("nc").cast("double"), 6)
          .as("lift_abs"),
        round((col("st").cast("double") / col("nt").cast("double"))
          / (col("sc").cast("double") / col("nc").cast("double")) - 1.0d, 6)
          .as("lift_rel"),
        round((col("st").cast("double") / col("nt").cast("double")
          - col("sc").cast("double") / col("nc").cast("double"))
          / sqrt(
            (col("qc").cast("double") / col("nc").cast("double")
              - (col("sc").cast("double") / col("nc").cast("double"))
                * (col("sc").cast("double") / col("nc").cast("double")))
              / col("nc").cast("double")
            + (col("qt").cast("double") / col("nt").cast("double")
              - (col("st").cast("double") / col("nt").cast("double"))
                * (col("st").cast("double") / col("nt").cast("double")))
              / col("nt").cast("double")), 6).as("z_stat"))
    val outM = graft.plans.Checkpoints.materialize(out)
    graft.plans.Checkpoints.free(arms)
    outM
  }

  val eventsAbLift: Q = Q.df(
    "events_ab_lift",
    """with pu as (
      |  select event_type, user_id, cast(count(*) as bigint) as x
      |  from events group by event_type, user_id),
      |armed as (select *,
      |  case when ((user_id % 2147483648) * 2654435761) % 4294967296
      |         >= 2147483648 then 1 else 0 end as arm from pu),
      |arms as (
      |  select event_type, arm, cast(count(*) as bigint) as n,
      |    cast(sum(x) as bigint) as s1, cast(sum(x * x) as bigint) as s2
      |  from armed group by event_type, arm)
      |select c.event_type, c.n as nc, t.n as nt,
      |  round(cast(c.s1 as double) / cast(c.n as double), 6) as mean_c,
      |  round(cast(t.s1 as double) / cast(t.n as double), 6) as mean_t,
      |  round(cast(t.s1 as double) / cast(t.n as double)
      |    - cast(c.s1 as double) / cast(c.n as double), 6) as lift_abs,
      |  round((cast(t.s1 as double) / cast(t.n as double))
      |    / (cast(c.s1 as double) / cast(c.n as double)) - 1.0, 6)
      |    as lift_rel,
      |  round((cast(t.s1 as double) / cast(t.n as double)
      |      - cast(c.s1 as double) / cast(c.n as double))
      |    / sqrt(
      |      (cast(c.s2 as double) / cast(c.n as double)
      |        - (cast(c.s1 as double) / cast(c.n as double))
      |          * (cast(c.s1 as double) / cast(c.n as double)))
      |        / cast(c.n as double)
      |      + (cast(t.s2 as double) / cast(t.n as double)
      |        - (cast(t.s1 as double) / cast(t.n as double))
      |          * (cast(t.s1 as double) / cast(t.n as double)))
      |        / cast(t.n as double)), 6) as z_stat
      |from (select * from arms where arm = 0) c
      |join (select * from arms where arm = 1) t using (event_type)
      |order by c.event_type""".stripMargin) { (s, dir) =>
    abLift(Tables.df(s, dir, "events")).orderBy(col("event_type"))
  }

  /** Session gap for the native session_window entry (seconds) — same
    * bound as the range join family. */
  val SessionGapSec = 600L

  /** Spark's NATIVE session_window operator run in batch — the
    * gap-merged session aggregation the streaming runtime uses, here
    * cross-checked against an INDEPENDENT formulation: the oracle
    * derives the same sessions from first principles (gaps-and-islands
    * over per-user event gaps), so the two implementations pin each
    * other. session_window's window end is last_event + gap by
    * definition; the islands oracle reproduces that. One shuffle on
    * user_id; session state is per-user and gap-bounded. */
  val windowSessionNative: Q = Q.df(
    "window_session_native",
    s"""with o as (select user_id, epoch_us(ts) as tus from events),
       |b as (select user_id, tus,
       |  case when tus - lag(tus) over (partition by user_id order by tus)
       |         > ${SessionGapSec * 1000000L}
       |       or lag(tus) over (partition by user_id order by tus) is null
       |       then 1 else 0 end as brk
       |  from o),
       |s as (select user_id, tus,
       |  sum(brk) over (partition by user_id order by tus
       |                 rows unbounded preceding) as sess
       |  from b)
       |select user_id, min(tus) as session_start_us,
       |  max(tus) + ${SessionGapSec * 1000000L} as session_end_us,
       |  cast(count(*) as bigint) as n_events
       |from s group by user_id, sess
       |order by user_id, session_start_us""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$SessionGapSec seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))
  }

  /** Minimum events for a regularity score (CV of 1 gap is meaningless). */
  val BotMinEvents = 5L

  /** Bot / automation detection by inter-event REGULARITY: per user, the
    * coefficient of variation of inter-event gaps — scripts fire on
    * timers (CV → 0) while humans are bursty (CV ≈ 1 for a Poisson
    * process, higher with sessions). The classic pre-filter before
    * events feed analytics or training. One lag window per user for
    * gaps (integral SECONDS — CV is scale-free), then exact moments:
    * Σg in int64, and Σg² as THREE int64 partial sums via the split
    * g = h·2²¹ + l, so Σg² = 2⁴²·Σh² + 2²²·Σhl + Σl². Each partial is
    * bounded inside int64 because a user's gaps telescope (Σg ≤ the
    * corpus time-span T): Σh² ≤ T²/2⁴², Σhl ≤ T, Σl² ≤ T·2²¹ — all
    * < 2⁵³ even at a century, so their int64→double casts are exact
    * and the shared recombine expression is IEEE-identical in both
    * engines. (A plain DECIMAL(38,0) Σg² was exact too but its 128-bit
    * aggregation buffer measured 2.2× slower than long sums.)
    *
    * Scale shape: per-user windows and a map-side-combined aggregate —
    * series-parallel; the flag threshold is a constant, not a learned
    * global. */
  def botRegularity(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("gap",
        expr("(tus - lag(tus) over (partition by user_id " +
          "order by tus, event_id)) div 1000000"))
      .filter(col("gap").isNotNull)
    val s2d = col("shh").cast("double") * lit(4398046511104.0d) +
      col("shl").cast("double") * lit(4194304.0d) +
      col("sll").cast("double")
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("s1"),
        sum(expr("(gap div 2097152) * (gap div 2097152)")).as("shh"),
        sum(expr("(gap div 2097152) * (gap % 2097152)")).as("shl"),
        sum(expr("(gap % 2097152) * (gap % 2097152)")).as("sll"))
      .filter(col("n_gaps") >= BotMinEvents - 1)
      .select(col("user_id"), col("n_gaps"),
        round(col("s1").cast("double") / col("n_gaps").cast("double"), 6)
          .as("mean_gap_sec"),
        round(
          sqrt((s2d / col("n_gaps").cast("double"))
            - (col("s1").cast("double") / col("n_gaps").cast("double"))
              * (col("s1").cast("double") / col("n_gaps").cast("double")))
            / (col("s1").cast("double") / col("n_gaps").cast("double")), 6)
          .as("gap_cv"))
  }

  val eventsBotRegularity: Q = Q.df(
    "events_bot_regularity",
    s"""with o as (select user_id, event_id, epoch_us(ts) as tus from events),
       |g as (select user_id,
       |        (tus - lag(tus) over (partition by user_id
       |                              order by tus, event_id)) // 1000000
       |          as gap
       |      from o),
       |agg as (select user_id, cast(count(*) as bigint) as n_gaps,
       |          cast(sum(gap) as bigint) as s1,
       |          cast(sum((gap // 2097152) * (gap // 2097152)) as bigint)
       |            as shh,
       |          cast(sum((gap // 2097152) * (gap % 2097152)) as bigint)
       |            as shl,
       |          cast(sum((gap % 2097152) * (gap % 2097152)) as bigint)
       |            as sll
       |        from g where gap is not null group by user_id)
       |select user_id, n_gaps,
       |  round(cast(s1 as double) / cast(n_gaps as double), 6)
       |    as mean_gap_sec,
       |  round(sqrt((cast(shh as double) * 4398046511104.0
       |        + cast(shl as double) * 4194304.0
       |        + cast(sll as double)) / cast(n_gaps as double)
       |      - (cast(s1 as double) / cast(n_gaps as double))
       |        * (cast(s1 as double) / cast(n_gaps as double)))
       |    / (cast(s1 as double) / cast(n_gaps as double)), 6) as gap_cv
       |from agg where n_gaps >= ${BotMinEvents - 1}
       |order by user_id""".stripMargin) { (s, dir) =>
    botRegularity(Tables.df(s, dir, "events")).orderBy(col("user_id"))
  }

  // ---- Markov removal-effect attribution ---------------------------------

  /** Non-conversion channels of the chain (ascending, pinned). */
  val MarkovChannels: Seq[String] = Seq("click", "error", "signup", "view")
  val MarkovRounds = 6
  /** Fixed-point unit: probabilities travel as integer nano-units. */
  val MarkovScale = 1000000000L

  /** Transition counts from first-conversion-truncated user journeys —
    * the DISTRIBUTED part of the attribution: every journey starts at
    * START, each step moves to the next event's type (purchase becomes
    * the absorbing CONV), and a journey that ends without converting
    * falls into NULL. All joins/windows are user-keyed (co-partitioned
    * at any scale); the output is a channel-cardinality count table. */
  /** Every user's journey rows with their position and the user's
    * first-purchase position (`prn`, NULL when never converting) — the
    * shared preparation both data-driven attribution models truncate
    * from (Markov keeps rows ≤ prn including the conversion; Shapley
    * keeps strictly pre-conversion rows of converted users). One
    * definition so the trio's journey semantics cannot desynchronize. */
  private def journeysWithFirstPurchase(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .drop("ts", "event_id")
    val fp = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("rn").as("prn"))
    e.join(fp, Seq("user_id"), "left")
  }

  def markovTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = journeysWithFirstPurchase(events)
      .filter(col("prn").isNull || col("rn") <= col("prn"))
    def mapDst(c: org.apache.spark.sql.Column) =
      when(c === "purchase", lit("CONV")).otherwise(c)
    val first = j.filter(col("rn") === 1)
      .select(lit("START").as("src"), mapDst(col("event_type")).as("dst"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val pairs = j
      .withColumn("nxt", lead(col("event_type"), 1).over(w2))
      .filter(col("nxt").isNotNull)
      .select(col("event_type").as("src"), mapDst(col("nxt")).as("dst"))
    val lastOpen = j.filter(col("prn").isNull)
      .groupBy(col("user_id"))
      .agg(max(struct(col("rn"), col("event_type"))).as("m"))
      .select(col("m.event_type").as("src"), lit("NULL").as("dst"))
    first.union(pairs).union(lastOpen)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** K-step absorption probability from START in integer NANO-units:
    * each term floors (q(s)·n(s,t)) / tn(s) BEFORE summing — integer
    * addition is order-free, so the fixed-point value is bit-identical
    * however the terms arrive, and the oracle reproduces it with the
    * same per-term `//`. `drop` redirects every transition INTO that
    * channel to NULL (the removal-effect counterfactual: row sums are
    * preserved, the channel just stops carrying). */
  def markovAbsorption(counts: Seq[(String, String, Long)],
      drop: Option[String], rounds: Int): Long = {
    val cv = counts
      .filterNot { case (s, _, _) => drop.contains(s) }
      .map { case (s, d, n) =>
        (s, if (drop.contains(d)) "NULL" else d, n)
      }
    val tn = cv.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var q = Map("START" -> MarkovScale)
    for (_ <- 1 to rounds) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      next("CONV") = q.getOrElse("CONV", 0L) // absorber retains
      for ((s, d, n) <- cv) {
        val qs = q.getOrElse(s, 0L)
        if (qs > 0L && s != "CONV" && s != "NULL")
          // BigInt product: qs (≤ 1e9) times a raw transition count
          // must not wrap a Long at extreme corpus sizes — the oracle's
          // hugeint multiply is exact, and this side must match it
          next(d) += (BigInt(qs) * n / tn(s)).toLong
      }
      q = next.toMap
    }
    q.getOrElse("CONV", 0L)
  }

  /** One variant's chain CTEs for the oracle (tag `b` = base, `cI` =
    * channel I removed). Everything MATERIALIZED: the per-round CTEs
    * chain 6 deep across 5 variants, and DuckDB's inliner must not
    * re-expand the shared count table per reference. */
  private def markovChainCtes(tag: String, drop: Option[String]): String = {
    val redirect = drop
      .map(c => s"case when dst = '$c' then 'NULL' else dst end")
      .getOrElse("dst")
    val srcFilter = drop.map(c => s"where src <> '$c'").getOrElse("")
    val head =
      s"""cv_$tag as materialized (select src, $redirect as dst,
         |    cast(sum(n) as bigint) as n from cnt $srcFilter group by 1, 2),
         |tv_$tag as materialized (select src, cast(sum(n) as bigint) as tn
         |    from cv_$tag group by src),
         |q0_$tag as (select 'START' as state,
         |    cast($MarkovScale as bigint) as q)""".stripMargin
    val rounds = (1 to MarkovRounds).map { i =>
      s"""q${i}_$tag as materialized (select state,
         |  cast(sum(q) as bigint) as q from (
         |    select c.dst as state, (p.q * c.n) // t.tn as q
         |    from q${i - 1}_$tag p
         |    join cv_$tag c on c.src = p.state
         |    join tv_$tag t on t.src = c.src
         |    union all
         |    select state, q from q${i - 1}_$tag where state = 'CONV') u
         |  group by state)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  private def markovOracle: String = {
    val variants = ("b", Option.empty[String]) +:
      MarkovChannels.zipWithIndex.map { case (c, i) => (s"c$i", Some(c)) }
    val rem = MarkovChannels.zipWithIndex.map { case (c, i) =>
      s"select '$c' as channel, (select q from q${MarkovRounds}_c$i " +
        s"where state = 'CONV') as qc"
    }.mkString("\n  union all\n  ")
    s"""with e as (select user_id, event_type,
       |    row_number() over (partition by user_id
       |                       order by ts, event_id) as rn
       |  from events),
       |fp as (select user_id, min(rn) as prn from e
       |       where event_type = 'purchase' group by user_id),
       |j as (select e.user_id, e.event_type, e.rn, fp.prn
       |      from e left join fp using (user_id)
       |      where fp.prn is null or e.rn <= fp.prn),
       |j2 as (select *, max(rn) over (partition by user_id) as mrn from j),
       |tr as (
       |  select 'START' as src, case when event_type = 'purchase'
       |      then 'CONV' else event_type end as dst from j2 where rn = 1
       |  union all
       |  select src, dst from (
       |    select event_type as src,
       |      case when lead(event_type) over (partition by user_id
       |          order by rn) = 'purchase' then 'CONV'
       |        else lead(event_type) over (partition by user_id
       |          order by rn) end as dst
       |    from j2) x where dst is not null
       |  union all
       |  select event_type as src, 'NULL' as dst from j2
       |  where prn is null and rn = mrn),
       |cnt as materialized (select src, dst, cast(count(*) as bigint) as n
       |    from tr group by 1, 2),
       |${variants.map { case (t, d) => markovChainCtes(t, d) }.mkString(",\n")},
       |bq as (select q from q${MarkovRounds}_b where state = 'CONV'),
       |rem as (
       |  $rem),
       |fin as (select channel,
       |    coalesce((select q from bq), 0) - coalesce(qc, 0) as rq
       |  from rem)
       |select channel, cast(rq as bigint) as removal_q,
       |  cast(rq as double) / (select cast(q as double) from bq)
       |    as removal_effect,
       |  cast(rq as double) / (select cast(sum(rq) as double) from fin)
       |    as share
       |from fin order by channel""".stripMargin
  }

  /** Markov removal-effect attribution — the data-driven model that
    * supersedes rule-based credit (first/last-touch,
    * [[eventsAttribution]]'s window models): build the journey
    * transition chain, measure K-step conversion probability, and
    * credit each channel by how much that probability DROPS when the
    * channel stops carrying (transitions into it fall to NULL). The
    * whole chain algebra runs on a channel-cardinality count table
    * (model-sized — the same driver-side contract as k-means
    * centroids); journeys and counts are the distributed part. The
    * fixed-point nano-unit iteration makes every intermediate an
    * integer, so the compare is exact and both engines fold in any
    * order; the two final divisions are IEEE-identical on identical
    * integers. */
  val eventsMarkovAttribution: Q = Q.df(
    "events_attribution_markov", markovOracle) { (s, dir) =>
    import s.implicits._
    val counts = markovTransitions(Tables.df(s, dir, "events"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val base = markovAbsorption(counts, None, MarkovRounds)
    val rows = MarkovChannels.map { c =>
      (c, base - markovAbsorption(counts, Some(c), MarkovRounds))
    }
    val tot = rows.map(_._2).sum
    // degenerate fixture slice (no reachable conversions): the oracle's
    // divisions yield NULL, so this side must too — never NaN
    def ratio(num: Long, den: Long): java.lang.Double =
      if (den == 0L) null else num.toDouble / den.toDouble
    rows.map { case (c, rq) =>
      (c, rq, ratio(rq, base), ratio(rq, tot))
    }.toDF("channel", "removal_q", "removal_effect", "share")
      .orderBy(col("channel"))
  }

  /** Shapley attribution over channel COALITIONS — the third member of
    * the attribution trio (rule-based windows, Markov removal, and now
    * the game-theoretic split): each user journey contributes its
    * pre-conversion channel SET as a 4-bit mask, the coalition value
    * v(S) counts converted users whose mask fits inside S, and each
    * channel's Shapley value averages its marginal contribution over
    * all orderings. With n = 4 channels the factorial weights share
    * denominator n! = 24, so 24·φ is an exact INTEGER
    * (Σ_S |S|!·(n−1−|S|)!·[v(S∪{c}) − v(S)]) — no float folds; the
    * output share divides two identical integers.
    *
    * Scale shape: the distributed part reduces every journey to one
    * (mask, converted) row and v(S) to a 16-row table (users ×
    * broadcast subsets, containment by bitmask); the Shapley sum runs
    * on those 16 integers — model-sized driver algebra, the k-means
    * contract. 2^n stays model-sized for the single-digit channel
    * counts marketing attribution runs at. */
  def shapleyCoalitions(events: DataFrame): DataFrame = {
    val bit = MarkovChannels.zipWithIndex.toMap // click=1,error=2,...
    val bitExpr = MarkovChannels.zipWithIndex
      .map { case (c, i) =>
        when(col("event_type") === c, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    // converted users' PRE-conversion events only; a user whose first
    // event converts has no such rows and contributes to no coalition
    // (standard treatment — no channel can claim an instant conversion)
    val perUser = journeysWithFirstPurchase(events)
      .filter(col("prn").isNotNull && col("rn") < col("prn"))
      .withColumn("b", bitExpr)
      .groupBy(col("user_id"))
      .agg(expr("bit_or(b)").as("mask"))
    val spark = events.sparkSession
    import spark.implicits._
    val full = (1L << bit.size) - 1
    val subsets = (0 until (1 << MarkovChannels.length)).map(_.toLong)
      .toDF("s")
    perUser
      .crossJoin(broadcast(subsets))
      .filter(col("mask").bitwiseAND(lit(full) - col("s")) === 0L)
      .groupBy(col("s")).agg(count(lit(1)).as("v"))
  }

  /** 24·φ per channel from the 16-row coalition-value table. */
  def shapleyFromValues(v: Map[Long, Long]): Seq[(String, Long)] = {
    val n = MarkovChannels.length
    def fact(k: Int): Long = (1 to k).product.toLong
    MarkovChannels.zipWithIndex.map { case (c, i) =>
      val cb = 1L << i
      var acc = 0L
      (0 until (1 << n)).map(_.toLong).filter(s => (s & cb) == 0).foreach {
        s =>
          val size = java.lang.Long.bitCount(s)
          acc += fact(size) * fact(n - 1 - size) *
            (v.getOrElse(s | cb, 0L) - v.getOrElse(s, 0L))
      }
      (c, acc)
    }
  }

  val eventsShapley: Q = Q.df(
    "events_attribution_shapley", {
      val n = MarkovChannels.length
      val bits = MarkovChannels.zipWithIndex
        .map { case (c, i) => s"when event_type = '$c' then ${1L << i}" }
        .mkString(" ", " ", " else 0 end")
      // weights |S|!(n-1-|S|)! for n=4 by subset size
      val wBySize = (0 until n).map(k =>
        ((1 to k).product.toLong * (1 to (n - 1 - k)).product.toLong))
      val wCase = wBySize.zipWithIndex
        .map { case (wt, k) => s"when $k then $wt" }
        .mkString("case bit_count(subsets.s) ", " ", " else 0 end")
      s"""with e as (select user_id, event_type,
         |    row_number() over (partition by user_id
         |                       order by ts, event_id) as rn
         |  from events),
         |fp as (select user_id, min(rn) as prn from e
         |       where event_type = 'purchase' group by user_id),
         |pu as (select e.user_id,
         |    bit_or(case$bits) as mask
         |  from e join fp using (user_id)
         |  where e.rn < fp.prn
         |  group by e.user_id),
         |subsets as (select range as s from range(0, ${1 << n})),
         |v as materialized (select s, cast(count(*) as bigint) as v
         |  from pu cross join subsets
         |  where (mask & (${(1 << n) - 1} - s)) = 0
         |  group by s),
         |phi as (${MarkovChannels.zipWithIndex.map { case (c, i) =>
        s"""select '$c' as channel, cast(sum(($wCase) *
           |    (coalesce(vc.v, 0) - coalesce(v0.v, 0))) as bigint)
           |    as phi24
           |  from subsets
           |  left join v v0 on v0.s = subsets.s
           |  left join v vc on vc.s = subsets.s | ${1L << i}
           |  where (subsets.s & ${1L << i}) = 0""".stripMargin
      }.mkString("\n  union all\n")})
         |select channel, phi24,
         |  cast(phi24 as double) /
         |    (select cast(sum(phi24) as double) from phi) as share
         |from phi order by channel""".stripMargin
    }) { (s, dir) =>
    import s.implicits._
    val v = shapleyCoalitions(Tables.df(s, dir, "events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val phi = shapleyFromValues(v)
    val tot = phi.map(_._2).sum
    // no coalition value anywhere (degenerate slice): NULL like the
    // oracle's division, never NaN
    phi.map { case (c, p) =>
      (c, p,
        (if (tot == 0L) null
         else p.toDouble / tot.toDouble): java.lang.Double)
    }.toDF("channel", "phi24", "share")
      .orderBy(col("channel"))
  }

  /** Smoothing factor for [[eventsEwma]] (the classic 0.3 — recent
    * days weigh in with a ~3-day effective memory). */
  val EwmaAlpha = 0.3

  /** Simple exponential smoothing over each type's daily series:
    * s₁ = x₁, sₜ = sₜ₋₁ + α·(xₜ − sₜ₋₁) — the one-step-ahead forecast
    * (ŷ = final level) behind capacity alerts and "is today unusual"
    * baselines, complementing [[eventsChangepoint]] (level SHIFT
    * detection) with level TRACKING. The recursion is inherently
    * sequential per series, so it runs as a fold over the
    * time-ordered daily list — per-group state is bounded by the DATE
    * SPAN (days per type), never by event count, which is what makes
    * the collect safe at 100 TB: the heavy reduction to daily counts
    * is a map-side-combined groupBy, and the fold sees one double per
    * day. Both engines fold the identical time-ordered list with the
    * identical double expression (DuckDB list_reduce seeds with the
    * first element; the Spark side seeds aggregate() with element 1
    * over the tail), so the result is bit-identical before the one
    * surface rounding. */
  val eventsEwma: Q = Q.df(
    "events_ewma_forecast",
    s"""with daily as (
       |  select event_type, cast(ts as date) as day,
       |    cast(count(*) as bigint) as cnt
       |  from events group by event_type, cast(ts as date)),
       |srt as (select event_type,
       |    list(cast(cnt as double) order by day) as xs,
       |    cast(count(*) as bigint) as n_days
       |  from daily group by event_type)
       |select event_type, n_days,
       |  round(list_reduce(xs,
       |    (a, x) -> a + cast($EwmaAlpha as double) * (x - a)), 6) as level
       |from srt order by event_type""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("cnt")))).as("s"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        round(aggregate(
          expr("slice(s, 2, size(s) - 1)"),
          element_at(col("s"), 1).getField("cnt").cast("double"),
          (a, x) =>
            a + lit(EwmaAlpha) * (x.getField("cnt").cast("double") - a)),
          6).as("level"))
      .orderBy(col("event_type"))
  }

  /** Holt's linear-trend smoothing factors. */
  val HoltAlpha = 0.3
  val HoltBeta = 0.2

  /** HOLT linear-trend smoothing over each type's daily series —
    * [[eventsEwma]] plus a trend state, the level+slope tracker behind
    * "are we growing and how fast" capacity forecasts:
    * l′ = α·x + (1−α)(l+t), t′ = β(l′−l) + (1−β)t, ŷ = l′+t′.
    * Same fold-over-the-time-ordered-list shape as the SES entry (state
    * bounded by date span), but the accumulator carries TWO fields —
    * Spark folds a struct accumulator; the ORACLE runs the recursion as
    * a recursive CTE over the indexed daily rows instead of a
    * struct-lambda list_reduce, because DuckDB's struct-accumulator
    * lambda mis-binds the accumulator fields past the second fold step
    * (verified: a 2-element fold agrees, the 3rd step reads a wrong
    * `a.l`) — the recursion states the identical double expressions and
    * matches Spark bit-for-bit. */
  /** Indexed-daily-series CTEs shared by the Holt oracle and the
    * forecast-eval oracle: `di(event_type, cnt, i)` (time-indexed
    * daily counts) and `n(event_type, n_days)`. */
  private def holtDailyCtes: String =
    """daily as (
      |  select event_type, cast(ts as date) as day,
      |    cast(count(*) as bigint) as cnt
      |  from events group by event_type, cast(ts as date)),
      |di as (select event_type, cnt,
      |    cast(row_number() over (partition by event_type order by day)
      |      as bigint) as i
      |  from daily),
      |n as (select event_type, cast(count(*) as bigint) as n_days
      |      from di group by event_type)""".stripMargin

  val eventsHolt: Q = Q.df(
    "events_holt_trend",
    s"""with recursive $holtDailyCtes,
       |h as (
       |  select event_type, cast(1 as bigint) as i, cast(cnt as double) as l,
       |    cast(0.0 as double) as t
       |  from di where i = 1
       |  union all
       |  select d.event_type, h.i + 1,
       |    cast($HoltAlpha * cast(d.cnt as double)
       |      + ${1 - HoltAlpha} * (h.l + h.t) as double),
       |    cast($HoltBeta * (($HoltAlpha * cast(d.cnt as double)
       |        + ${1 - HoltAlpha} * (h.l + h.t)) - h.l)
       |      + ${1 - HoltBeta} * h.t as double)
       |  from h join di d on d.event_type = h.event_type and d.i = h.i + 1)
       |select h.event_type, n.n_days,
       |  round(h.l, 6) as level, round(h.t, 6) as trend,
       |  round(h.l + h.t, 6) as forecast
       |from h join n on n.event_type = h.event_type and h.i = n.n_days
       |order by h.event_type""".stripMargin) { (s, dir) =>
    def L(a: org.apache.spark.sql.Column) = a.getField("l")
    def T(a: org.apache.spark.sql.Column) = a.getField("t")
    Tables.df(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("cnt")))).as("s"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        aggregate(
          expr("slice(s, 2, size(s) - 1)"),
          struct(
            element_at(col("s"), 1).getField("cnt").cast("double").as("l"),
            lit(0.0d).as("t")),
          (a, x) => {
            val xl = x.getField("cnt").cast("double")
            val lp = lit(HoltAlpha) * xl + lit(1 - HoltAlpha) * (L(a) + T(a))
            struct(lp.as("l"),
              (lit(HoltBeta) * (lp - L(a)) + lit(1 - HoltBeta) * T(a))
                .as("t"))
          }).as("st"))
      .select(col("event_type"), col("n_days"),
        round(col("st.l"), 6).as("level"),
        round(col("st.t"), 6).as("trend"),
        round(col("st.l") + col("st.t"), 6).as("forecast"))
      .orderBy(col("event_type"))
  }

  /** FORECAST BACKTEST — the model-QA discipline (classifier_eval_*,
    * retrieval_eval_ndcg) applied to the forecasting family: replay
    * each type's daily series, emit the ONE-STEP-AHEAD Holt forecast
    * f_t = l_{t−1}+t_{t−1} before folding x_t in, and score
    * MAE(holt) against MAE(naive carry-forward x_{t−1}) — the baseline
    * any forecaster must beat to justify its state. One 5-field
    * accumulator per series (level, trend, prev, Σ|err|, Σ|naive err|),
    * time-ordered fold in Spark ≡ recursive CTE in the oracle, error
    * sums accumulated in the same time order both sides. */
  val eventsForecastEval: Q = Q.df(
    "events_forecast_eval",
    s"""with recursive $holtDailyCtes,
       |h as (
       |  select event_type, cast(1 as bigint) as i, cast(cnt as double) as l,
       |    cast(0.0 as double) as t, cast(cnt as double) as prev,
       |    cast(0.0 as double) as se, cast(0.0 as double) as sn
       |  from di where i = 1
       |  union all
       |  select d.event_type, h.i + 1,
       |    cast($HoltAlpha * cast(d.cnt as double)
       |      + ${1 - HoltAlpha} * (h.l + h.t) as double),
       |    cast($HoltBeta * (($HoltAlpha * cast(d.cnt as double)
       |        + ${1 - HoltAlpha} * (h.l + h.t)) - h.l)
       |      + ${1 - HoltBeta} * h.t as double),
       |    cast(d.cnt as double),
       |    cast(h.se + abs(cast(d.cnt as double) - (h.l + h.t)) as double),
       |    cast(h.sn + abs(cast(d.cnt as double) - h.prev) as double)
       |  from h join di d on d.event_type = h.event_type and d.i = h.i + 1)
       |select h.event_type, n.n_days - 1 as n_evals,
       |  round(h.se / cast(n.n_days - 1 as double), 6) as holt_mae,
       |  round(h.sn / cast(n.n_days - 1 as double), 6) as naive_mae,
       |  h.se < h.sn as holt_beats_naive
       |from h join n on n.event_type = h.event_type and h.i = n.n_days
       |order by h.event_type""".stripMargin) { (s, dir) =>
    def F(a: org.apache.spark.sql.Column, f: String) = a.getField(f)
    Tables.df(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("cnt")))).as("s"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        aggregate(
          expr("slice(s, 2, size(s) - 1)"),
          struct(
            element_at(col("s"), 1).getField("cnt").cast("double").as("l"),
            lit(0.0d).as("t"),
            element_at(col("s"), 1).getField("cnt").cast("double")
              .as("prev"),
            lit(0.0d).as("se"), lit(0.0d).as("sn")),
          (a, x) => {
            val xv = x.getField("cnt").cast("double")
            val lp = lit(HoltAlpha) * xv +
              lit(1 - HoltAlpha) * (F(a, "l") + F(a, "t"))
            struct(lp.as("l"),
              (lit(HoltBeta) * (lp - F(a, "l")) +
                lit(1 - HoltBeta) * F(a, "t")).as("t"),
              xv.as("prev"),
              (F(a, "se") + abs(xv - (F(a, "l") + F(a, "t")))).as("se"),
              (F(a, "sn") + abs(xv - F(a, "prev"))).as("sn"))
          }).as("st"))
      .select(col("event_type"), (col("n_days") - 1).as("n_evals"),
        round(col("st.se") / (col("n_days") - 1).cast("double"), 6)
          .as("holt_mae"),
        round(col("st.sn") / (col("n_days") - 1).cast("double"), 6)
          .as("naive_mae"),
        (col("st.se") < col("st.sn")).as("holt_beats_naive"))
      .orderBy(col("event_type"))
  }

  /** Administrative-censoring margin: the study window ends this many
    * days before the corpus end. A user whose first purchase falls
    * after the cutoff is right-CENSORED at the cutoff — their
    * conversion time is known only to exceed the observed span. */
  val KmCensorDays = 3

  /** KAPLAN–MEIER time-to-conversion (survival analysis for the
    * funnel): "how long from first touch to first purchase" with the
    * estimator that handles RIGHT-CENSORING correctly — naive
    * conversion-time averages silently drop (or worse, count as
    * failures) the users whose purchase the study window simply hasn't
    * seen yet. Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over distinct conversion
    * times; censored users leave the risk set at the cutoff without
    * registering a conversion. Everything to the fold is exact
    * integers: times are day diffs, dᵢ/nᵢ are counts (the at-risk
    * count nᵢ is one descending cumulative window over the time
    * histogram), each factor is ONE division, and the product folds in
    * ascending-time order via the sorted-list discipline
    * ([[eventsHolt]]'s), so the doubles are bit-identical
    * cross-engine.
    *
    * Scale shape: two user-keyed map-side-combined aggregates, then
    * everything operates on the time HISTOGRAM — rows bounded by the
    * day span, never the user count; the windows run on that
    * ≤ span-sized frame. */
  val eventsSurvivalKm: Q = Q.df(
    "events_survival_km",
    s"""with ev as (select user_id, event_type, cast(ts as date) as d
       |           from events),
       |u as (select user_id, min(d) as f from ev group by user_id),
       |p as (select user_id, min(d) as fp from ev
       |      where event_type = 'purchase' group by user_id),
       |h as (select date_add(max(d), -$KmCensorDays) as hcut from ev),
       |lv as (select u.user_id,
       |    cast(case when p.fp is not null and p.fp <= h.hcut
       |         then date_diff('day', u.f, p.fp)
       |         else date_diff('day', u.f, h.hcut) end as bigint) as life,
       |    p.fp is null or p.fp > h.hcut as censored
       |  from u left join p on p.user_id = u.user_id
       |  cross join h
       |  where u.f <= h.hcut),
       |hist as (select life, cast(count(*) as bigint) as n_all,
       |    cast(sum(case when not censored then 1 else 0 end) as bigint)
       |      as n_churn
       |  from lv group by life),
       |risk as (select life, n_churn,
       |    cast(sum(n_all) over (order by life desc) as bigint) as n_risk
       |  from hist),
       |km as (select life as t_day, n_risk, n_churn,
       |    cast(n_risk - n_churn as double) / cast(n_risk as double) as fac
       |  from risk where n_churn > 0),
       |fold as (select t_day, n_risk, n_churn,
       |    list([cast(t_day as double), fac]) over
       |      (order by t_day rows between unbounded preceding
       |       and current row) as fs
       |  from km)
       |select t_day, n_risk, n_churn,
       |  round(list_reduce(list_prepend(cast(1.0 as double),
       |    list_transform(list_sort(fs), x -> x[2])), (a, y) -> a * y), 6)
       |    as km_surv
       |from fold order by t_day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.df(s, dir, "events")
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("d"))
    val u = ev.groupBy(col("user_id")).agg(min(col("d")).as("f"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("d")).as("fp"))
    val h = ev.agg(date_add(max(col("d")), -KmCensorDays).as("hcut"))
    val hist = u.join(p, Seq("user_id"), "left")
      .crossJoin(broadcast(h))
      .filter(col("f") <= col("hcut"))
      .select(
        when(col("fp").isNotNull && col("fp") <= col("hcut"),
          datediff(col("fp"), col("f")))
          .otherwise(datediff(col("hcut"), col("f")))
          .cast("long").as("life"),
        (col("fp").isNull || col("fp") > col("hcut")).as("censored"))
    kmCurve(hist)
  }

  /** The KM estimator over per-subject `(life, censored)` rows —
    * exposed so the censored-branch algebra is unit-testable on a
    * hand-computed dataset (the fixture's users all convert inside the
    * window, so the entry alone would leave censoring unexercised). */
  private[graft] def kmCurve(lv: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = lv
      .groupBy(col("life"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(!col("censored"), 1L).otherwise(0L)).as("n_churn"))
    // the windows below run on the lifetime histogram — day-span-sized
    val wDesc = Window.orderBy(col("life").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("n_risk", sum(col("n_all")).over(wDesc))
      .filter(col("n_churn") > 0)
      .select(col("life").as("t_day"), col("n_risk"), col("n_churn"),
        ((col("n_risk") - col("n_churn")).cast("double") /
          col("n_risk").cast("double")).as("fac"))
      .withColumn("fs", collect_list(
        array(col("t_day").cast("double"), col("fac"))).over(wAsc))
      .select(col("t_day"), col("n_risk"), col("n_churn"),
        round(aggregate(
          expr("transform(array_sort(fs), x -> x[1])"),
          lit(1.0d), (a, y) => a * y), 6).as("km_surv"))
      .orderBy(col("t_day"))
  }

  val queries: Seq[Q] = Seq(eventsFunnel, eventsCohort, eventsPaths,
    eventsSurvivalKm,
    eventsAnomaly, eventsRfm, eventsActiveUsers, eventsFunnelWindowed,
    eventsWinsorize, eventsDistinctRunning, eventsMadOutliers,
    eventsAttribution, eventsMarkovAttribution, eventsShapley,
    eventsTransitions,
    eventsPathPattern, eventsStreaks,
    eventsChangepoint, eventsSeasonality, eventsEwma, eventsHolt,
    eventsForecastEval,
    eventsAbLift,
    windowSessionNative,
    eventsBotRegularity)
}
