package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Temporal join operators the reference lacks entirely (beyond-reference
  * surface, like windows/streaming): AS-OF join and bounded range join
  * over the events table. Both are composed from built-in operators
  * (SURVEY §7.3 preference (a)) in shapes that scale:
  *
  * - AS-OF: one union + one window over (user, time) — a single shuffle
  *   keyed on user_id, state bounded by the window frame. No per-row
  *   subquery, no inequality join.
  * - Range join: an equi-join on (user, time-bin) with bin width equal
  *   to the range bound, so each candidate pair meets in at most one
  *   bin pair and the join never degenerates to a nested-loop
  *   inequality join (Spark's fallback for pure theta joins).
  */
object Temporal {

  /** AS-OF join: for each left ("probe") row, the single latest right
    * ("quote") row with rts <= lts within the same key. Implemented as
    * union + running `last(_, ignoreNulls)` ordered by (ts, rightness,
    * id): right rows sort before left rows at equal ts (>= semantics),
    * and the trailing id breaks exact-ts ties deterministically. */
  def asofJoin(left: DataFrame, right: DataFrame): DataFrame = {
    // The matched right row travels as ONE struct through a single
    // last(_, ignoreNulls) window (null for probe rows, so they are
    // skipped): all matched fields come from the same right row even
    // when some of its fields are NULL. Three independent last()
    // windows would splice fields from different rows whenever the
    // matched row's value is NULL.
    val l = left.select(col("user_id"), col("ts"), col("event_id"),
      lit(0).as("is_r"),
      lit(null).cast("struct<r_ts:timestamp,r_event_id:bigint,r_value:double>")
        .as("r_row"))
    val r = right.select(col("user_id"), col("ts"), col("event_id"),
      lit(1).as("is_r"),
      struct(col("ts").as("r_ts"), col("event_id").as("r_event_id"),
        col("value").as("r_value")).as("r_row"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_r").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m", last(col("r_row"), ignoreNulls = true).over(w))
      .filter(col("is_r") === 0)
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts").as("p_ts"), col("m.r_ts").as("v_ts"),
        col("m.r_event_id").as("v_event_id"), col("m.r_value").as("v_value"))
  }

  /** The purchase-AS-OF-view semantics, spelled once with correlated
    * subqueries (deterministic even when several views share the
    * boundary timestamp — max ts, then max event_id within it); shared
    * by the composed implementation AND the native whole-operator one,
    * which must agree with it bit-for-bit. */
  val asofOracle: String =
    """with p as (select * from events where event_type = 'purchase'),
      |v as (select * from events where event_type = 'view')
      |select p.event_id as p_event_id, p.user_id, p.ts as p_ts,
      |  (select max(v.ts) from v
      |    where v.user_id = p.user_id and v.ts <= p.ts) as v_ts,
      |  (select max(v.event_id) from v
      |    where v.user_id = p.user_id and v.ts = (
      |      select max(v2.ts) from v v2
      |      where v2.user_id = p.user_id and v2.ts <= p.ts)) as v_event_id,
      |  (select max(v.value) from v
      |    where v.user_id = p.user_id and v.event_id = (
      |      select max(v3.event_id) from v v3
      |      where v3.user_id = p.user_id and v3.ts = (
      |        select max(v2.ts) from v v2
      |        where v2.user_id = p.user_id and v2.ts <= p.ts))) as v_value
      |from p order by p_event_id""".stripMargin

  /** purchase AS-OF view via the composed union+window form. */
  val asofPurchaseView: Q = Q.df("join_asof", asofOracle) { (s, dir) =>
    val ev = Tables.df(s, dir, "events")
    asofJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"))
      .orderBy(col("p_event_id"))
  }

  /** The same as-of semantics through the NATIVE whole-operator path
    * ([[graft.plans.AsOfJoinNative]]: custom LogicalPlan + planner
    * strategy + merge-join SparkPlan) — gated against the identical
    * oracle as `join_asof`, so the two implementations are pinned to
    * agree bit-for-bit. */
  val asofNativeQ: Q = Q.df("join_asof_native", asofOracle) { (s, dir) =>
    val ev = Tables.df(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_event_id"), col("value").as("v_value"))
    graft.plans.AsOfJoinNative
      .join(p, v, "p_user", "p_ts", "v_user", "v_ts", "v_event_id")
      .select(col("p_event_id"), col("p_user").as("user_id"), col("p_ts"),
        col("v_ts"), col("v_event_id"), col("v_value"))
      .orderBy(col("p_event_id"))
  }

  val RangeWindowSec = 600L

  /** Bounded range join: (view, purchase) pairs of the same user with
    * v.ts <= p.ts < v.ts + bound. Each side is keyed by
    * floor(epoch / bound); a qualifying pair differs by at most one bin,
    * so replicating the LEFT side into bins {b, b+1} and equi-joining on
    * (user_id, bin) finds every pair exactly once — shuffle is 2× the
    * filtered inputs, never the O(n²) candidate matrix. */
  def rangeJoin(left: DataFrame, right: DataFrame, boundSec: Long): DataFrame = {
    val bin = floor(unix_timestamp(col("ts")) / boundSec)
    val l = left.select(col("user_id"), col("event_id").as("v_event_id"),
        col("ts").as("v_ts"), bin.as("b0"))
      .withColumn("bin", explode(array(col("b0"), col("b0") + 1)))
      .drop("b0")
    val r = right.select(col("user_id"), col("event_id").as("p_event_id"),
        col("ts").as("p_ts"), bin.as("bin"))
    l.join(r, Seq("user_id", "bin"))
      .filter(col("p_ts") >= col("v_ts") &&
        col("p_ts") < col("v_ts") + expr(s"interval $boundSec second"))
      // exact µs gap — second-truncated arithmetic would round differently
      // across engines on sub-second timestamps
      .select(col("user_id"), col("v_event_id"), col("p_event_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** view→purchase conversions inside a 10-minute window; the oracle is
    * the plain inequality join DuckDB can afford at fixture scale. */
  val rangeViewPurchase: Q = Q.df(
    "join_range",
    s"""select v.user_id, v.event_id as v_event_id, p.event_id as p_event_id,
       |  epoch_us(p.ts) - epoch_us(v.ts) as gap_us
       |from (select * from events where event_type = 'view') v
       |join (select * from events where event_type = 'purchase') p
       |  on v.user_id = p.user_id
       | and p.ts >= v.ts and p.ts < v.ts + interval $RangeWindowSec second
       |order by v_event_id, p_event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.df(s, dir, "events")
    rangeJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      RangeWindowSec)
      .orderBy(col("v_event_id"), col("p_event_id"))
  }

  /** High-value threshold for the sparse slice the gap-fill resamples
    * (the full stream has an event for every (type, day) cell, so a raw
    * resample would fill nothing). */
  val GapValueMin = 175.0

  /** Calendar gap-fill / resampling: per-type daily counts of high-value
    * events, densified to one row per (type, day) over the stream's full
    * date span — missing cells become explicit zeros flagged `is_gap`.
    * The downsample-then-densify shape every time-series store calls
    * resample, needed before rolling windows or anomaly scoring can
    * trust "no row" to mean "zero" rather than "missing".
    *
    * Scale shape: the calendar is generated from ONE global (min, max)
    * aggregate — a two-value reduce, not a distinct-days shuffle — and
    * the dense frame is |types|·|days| rows, independent of event count;
    * the only fact-scale work is the filtered daily count with map-side
    * partial aggregation. */
  def gapFill(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("value") >= GapValueMin)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val span = events.agg(
      to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
    val calendar = span.select(
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
        .as("day"))
    val types = events.select(col("event_type")).distinct()
    types.crossJoin(calendar)
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("cnt"),
        col("n").isNull.as("is_gap"))
  }

  val tsGapFill: Q = Q.df(
    "ts_gap_fill",
    s"""with daily as (
       |  select event_type, cast(ts as date) as day,
       |    cast(count(*) as bigint) as n
       |  from events where value >= $GapValueMin
       |  group by event_type, cast(ts as date)),
       |cal as (select unnest(generate_series(
       |    (select min(cast(ts as date)) from events),
       |    (select max(cast(ts as date)) from events),
       |    interval 1 day))::date as day),
       |types as (select distinct event_type from events)
       |select t.event_type, cal.day,
       |  coalesce(daily.n, cast(0 as bigint)) as cnt,
       |  daily.n is null as is_gap
       |from types t cross join cal
       |left join daily on daily.event_type = t.event_type
       |  and daily.day = cal.day
       |order by t.event_type, cal.day""".stripMargin) { (s, dir) =>
    gapFill(Tables.df(s, dir, "events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** NEAREST-direction as-of join: for each probe (purchase) row, the
    * single closest quote (view) row in EITHER time direction within
    * `boundSec`, ties preferring the earlier quote then the larger
    * event_id. Backward-only as-of is [[asofJoin]]; the nearest variant
    * is what feature pipelines use when a measurement may land just
    * after the anchor (sensor clock skew, late attribution).
    *
    * Scale shape: same bin-replication trick as [[rangeJoin]] — a
    * qualifying pair's `floor(epoch/bound)` bins differ by at most 1,
    * so replicating the quote side into bins {b-1, b, b+1} and
    * equi-joining on (user_id, bin) meets every candidate exactly once;
    * the per-probe argmin is then a row_number window keyed on the
    * probe id. Shuffle is 3× the filtered quote side + 1× the probe
    * side — never a nested-loop theta join. */
  def asofNearest(probe: DataFrame, quote: DataFrame,
      boundSec: Long): DataFrame = {
    val bin = floor(unix_timestamp(col("ts")) / boundSec)
    val p = probe.select(col("user_id"), col("event_id").as("p_event_id"),
      col("ts").as("p_ts"), bin.as("bin"))
    val q = quote.select(col("user_id"), col("event_id").as("v_event_id"),
        col("ts").as("v_ts"), bin.as("b0"))
      .withColumn("bin",
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")
    val cand = p.join(q, Seq("user_id", "bin"))
      .withColumn("gap_us",
        unix_micros(col("v_ts")) - unix_micros(col("p_ts")))
      .filter(abs(col("gap_us")) <= boundSec * 1000000L)
    val w = Window.partitionBy(col("p_event_id"))
      .orderBy(abs(col("gap_us")).asc, col("v_ts").asc,
        col("v_event_id").desc)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_event_id"), col("user_id"), col("p_ts"),
        col("v_event_id"), col("v_ts"), col("gap_us"))
  }

  /** Nearest view around each purchase within ±10 minutes; the oracle
    * is the plain bounded theta join + the same argmin window. */
  val asofNearestQ: Q = Q.df(
    "join_asof_nearest",
    s"""with p as (select * from events where event_type = 'purchase'),
       |v as (select * from events where event_type = 'view'),
       |cand as (
       |  select p.event_id as p_event_id, p.user_id, p.ts as p_ts,
       |    v.event_id as v_event_id, v.ts as v_ts,
       |    epoch_us(v.ts) - epoch_us(p.ts) as gap_us
       |  from p join v on v.user_id = p.user_id
       |   and v.ts >= p.ts - interval $RangeWindowSec second
       |   and v.ts <= p.ts + interval $RangeWindowSec second),
       |r as (select *, row_number() over (partition by p_event_id
       |        order by abs(gap_us) asc, v_ts asc, v_event_id desc) as rn
       |      from cand)
       |select p_event_id, user_id, p_ts, v_event_id, v_ts,
       |  cast(gap_us as bigint) as gap_us
       |from r where rn = 1 order by p_event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.df(s, dir, "events")
    asofNearest(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"),
      RangeWindowSec)
      .orderBy(col("p_event_id"))
  }

  /** Linear-interpolation resample over [[gapFill]]'s dense grid — the
    * fill a downstream model wants when "no observation" means "the
    * level persisted", not "zero": each gap day takes the straight line
    * between its nearest observed neighbors (prev-only at the right
    * edge, next-only at the left). The neighbor lookup is the two-window
    * IGNORE NULLS trick — last_value over the preceding frame, first
    * over the following — so each per-type series is one partitioned
    * sort, state bounded by the series, nothing global.
    *
    * Determinism: observed inputs are exact integer counts; both
    * engines evaluate the identical prev + (next−prev)·frac double
    * expression, rounded at the surface. */
  def interpResample(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dense = gapFill(events)
      .withColumn("obs", when(col("is_gap"), lit(null)).otherwise(col("cnt")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val prevW = w.rowsBetween(Window.unboundedPreceding, 0)
    val nextW = w.rowsBetween(0, Window.unboundedFollowing)
    val obsDay = when(col("obs").isNotNull, col("day"))
    dense
      .withColumn("pv", last(col("obs"), ignoreNulls = true).over(prevW))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(prevW))
      .withColumn("nv", first(col("obs"), ignoreNulls = true).over(nextW))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(nextW))
      .select(col("event_type"), col("day"), col("is_gap"),
        round(
          when(col("pv").isNull, col("nv").cast("double"))
            .when(col("nv").isNull, col("pv").cast("double"))
            .when(col("nd") === col("pd"), col("pv").cast("double"))
            .otherwise(col("pv").cast("double")
              + (col("nv") - col("pv")).cast("double")
                * datediff(col("day"), col("pd")).cast("double")
                / datediff(col("nd"), col("pd")).cast("double")),
          6).as("v_interp"))
  }

  val tsInterp: Q = Q.df(
    "ts_resample_interp",
    s"""with daily as (
       |  select event_type, cast(ts as date) as day,
       |    cast(count(*) as bigint) as n
       |  from events where value >= $GapValueMin
       |  group by event_type, cast(ts as date)),
       |cal as (select unnest(generate_series(
       |    (select min(cast(ts as date)) from events),
       |    (select max(cast(ts as date)) from events),
       |    interval 1 day))::date as day),
       |types as (select distinct event_type from events),
       |dense as (
       |  select t.event_type, cal.day, daily.n as obs,
       |    daily.n is null as is_gap
       |  from types t cross join cal
       |  left join daily on daily.event_type = t.event_type
       |    and daily.day = cal.day),
       |nb as (
       |  select event_type, day, is_gap,
       |    last_value(obs ignore nulls) over (partition by event_type
       |      order by day rows between unbounded preceding
       |      and current row) as pv,
       |    last_value(case when obs is not null then day end ignore nulls)
       |      over (partition by event_type order by day
       |            rows between unbounded preceding and current row) as pd,
       |    first_value(obs ignore nulls) over (partition by event_type
       |      order by day rows between current row
       |      and unbounded following) as nv,
       |    first_value(case when obs is not null then day end ignore nulls)
       |      over (partition by event_type order by day
       |            rows between current row and unbounded following) as nd
       |  from dense)
       |select event_type, day, is_gap,
       |  round(case
       |    when pv is null then cast(nv as double)
       |    when nv is null then cast(pv as double)
       |    when nd = pd then cast(pv as double)
       |    else cast(pv as double)
       |      + cast(nv - pv as double)
       |        * cast(day - pd as double) / cast(nd - pd as double)
       |    end, 6) as v_interp
       |from nb order by event_type, day""".stripMargin) { (s, dir) =>
    interpResample(Tables.df(s, dir, "events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** General INTERVAL-overlap join — the temporal-DB primitive
    * [[rangeJoin]]'s point-in-window form cannot express: both sides
    * are intervals (here: width-[[RangeWindowSec]] activity windows
    * opened by each view / purchase event) and a pair qualifies when
    * the intervals genuinely intersect, reporting the overlap length.
    *
    * Scale shape: bin-replicate-and-canonicalize. Each interval copies
    * to every W-wide time bin it touches (≤2 copies for width-W
    * intervals — replication factor is ⌈len/W⌉+1, bounded and chosen by
    * the bin width); candidates equi-join on (user, bin) — never a
    * theta join — and each qualifying pair is counted EXACTLY once by
    * keeping only the bin containing the overlap's left edge (a
    * canonical-bin test, cheaper than a distinct over the pair set).
    * All arithmetic is int64 epoch-micros. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      wSec: Long): DataFrame = {
    val w = wSec * 1000000L
    def bins(df: DataFrame, id: String, s: String, e: String) =
      df.select(col("user_id"), col(id), col(s), col(e),
        explode(sequence(floor(col(s) / w).cast("long"),
          floor((col(e) - 1) / w).cast("long"))).as("bin"))
    val l = bins(left.select(col("user_id"),
      col("event_id").as("v_event_id"),
      unix_micros(col("ts")).as("vs"),
      (unix_micros(col("ts")) + w).as("ve")), "v_event_id", "vs", "ve")
    val r = bins(right.select(col("user_id"),
      col("event_id").as("p_event_id"),
      unix_micros(col("ts")).as("ps"),
      (unix_micros(col("ts")) + w).as("pe")), "p_event_id", "ps", "pe")
    l.join(r, Seq("user_id", "bin"))
      .filter(col("vs") < col("pe") && col("ps") < col("ve"))
      .filter(col("bin") ===
        floor(greatest(col("vs"), col("ps")) / w).cast("long"))
      .select(col("user_id"), col("v_event_id"), col("p_event_id"),
        (least(col("ve"), col("pe")) - greatest(col("vs"), col("ps")))
          .as("overlap_us"))
  }

  val intervalOverlapQ: Q = Q.df(
    "join_interval_overlap",
    s"""with v as (select user_id, event_id as v_event_id,
       |    epoch_us(ts) as vs, epoch_us(ts) + ${RangeWindowSec * 1000000L} as ve
       |  from events where event_type = 'view'),
       |p as (select user_id, event_id as p_event_id,
       |    epoch_us(ts) as ps, epoch_us(ts) + ${RangeWindowSec * 1000000L} as pe
       |  from events where event_type = 'purchase')
       |select v.user_id, v_event_id, p_event_id,
       |  least(ve, pe) - greatest(vs, ps) as overlap_us
       |from v join p on v.user_id = p.user_id
       | and vs < pe and ps < ve
       |order by v_event_id, p_event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.df(s, dir, "events")
    intervalOverlapJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      RangeWindowSec)
      .orderBy(col("v_event_id"), col("p_event_id"))
  }

  /** OHLC downsampling — the classic time-series bar aggregation (per
    * (series, bucket): opening/closing/extreme values + volume), here
    * per (event_type, hour). Open and close are ELEMENT PICKS via
    * first/last over the unique (ts, event_id) order and high/low are
    * min/max — not one float sum in the entry, so every column is
    * bit-exact cross-engine. One window pass + one partial-aggregating
    * groupBy, both on the same (type, hour) key: series-parallel at any
    * scale. */
  val ohlcBars: Q = Q.df(
    "temporal_ohlc_bars",
    """with base as (
      |  select event_type, date_trunc('hour', ts) as bar, value,
      |    first_value(value) over (partition by event_type, date_trunc('hour', ts)
      |      order by ts, event_id
      |      rows between unbounded preceding and unbounded following) as o,
      |    last_value(value) over (partition by event_type, date_trunc('hour', ts)
      |      order by ts, event_id
      |      rows between unbounded preceding and unbounded following) as c
      |  from events)
      |select event_type, bar,
      |  max(o) as open, max(value) as high, min(value) as low,
      |  max(c) as close, cast(count(*) as bigint) as volume
      |from base group by event_type, bar
      |order by event_type, bar""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val bar = date_trunc("hour", col("ts"))
    val w = Window.partitionBy(col("event_type"), bar)
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.df(s, dir, "events")
      .select(col("event_type"), bar.as("bar"), col("value"),
        first(col("value")).over(w).as("o"),
        last(col("value")).over(w).as("c"))
      .groupBy(col("event_type"), col("bar"))
      .agg(max(col("o")).as("open"), max(col("value")).as("high"),
        min(col("value")).as("low"), max(col("c")).as("close"),
        count(lit(1)).as("volume"))
      .orderBy(col("event_type"), col("bar"))
  }

  val queries: Seq[Q] =
    Seq(asofPurchaseView, asofNativeQ, rangeViewPurchase, tsGapFill,
      asofNearestQ, tsInterp, intervalOverlapQ, ohlcBars)
}
