package graft

import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants of the event-analytics operators — properties
  * that must hold regardless of data, checked on the fixtures. The
  * value-level correctness of each entry is the DuckDB oracle's job;
  * these pin the RELATIONS between operators that the oracles cannot
  * see (each oracle checks one query in isolation).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.operators.Analytics

  private lazy val events = Tables.df(spark, TestSpark.Sf, "events")

  test("WAU dominates DAU on every day (7-day window contains the day)") {
    val rows = Analytics.activeUsers(events).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"day ${r.get(0)}: DAU ${r.getLong(1)} > WAU ${r.getLong(2)}")
    }
  }

  test("changepoint lands on a constructed level shift") {
    import spark.implicits._
    val day = 86400L
    // 10 days at 2 events/day, then 10 days at 8/day: the mean-shift
    // argmax must be the last low day (split i=10, day index 9)
    val rows = (0 until 20).flatMap { d =>
      val perDay = if (d < 10) 2 else 8
      (0 until perDay).map(k =>
        (d.toLong * 100 + k, d * day + k, 1L, "X", 1.0))
    }
    val ev = rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .selectExpr("event_id",
        "cast(timestamp_seconds(sec) as timestamp) as ts",
        "user_id", "event_type", "value")
    val out = Analytics.changepoints(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDate(1).toLocalDate.getDayOfMonth == 10,
      s"change day ${r.getDate(1)} should be the 10th low day (1970-01-10)")
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 8.0,
      s"means ${r.getDouble(2)}/${r.getDouble(3)} should be 2/8")
  }

  test("bot regularity: a metronome scores ~0 CV, a bursty user scores high") {
    import spark.implicits._
    val day = 3600L
    // user 1: perfect 60s metronome (CV 0); user 2: gaps 1s,1s,1s,3597s
    val rows =
      (0 until 10).map(k => (100L + k, k * 60L, 1L, "X", 1.0)) ++
        Seq((200L, 0L, 2L, "X", 1.0), (201L, 1L, 2L, "X", 1.0),
          (202L, 2L, 2L, "X", 1.0), (203L, 3L, 2L, "X", 1.0),
          (204L, day, 2L, "X", 1.0))
    val ev = rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .selectExpr("event_id",
        "cast(timestamp_seconds(sec) as timestamp) as ts",
        "user_id", "event_type", "value")
    val out = graft.operators.Analytics.botRegularity(ev).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 60.0 && out(1L)._2 == 0.0,
      s"metronome user: ${out(1L)}")
    assert(out(2L)._2 > 1.5, s"bursty user CV ${out(2L)._2} too low")
  }

  test("seasonality: adjusted series is mean-zero within every (type, dow) cell") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.seasonality(events).collect()
      .map(r => (r.getString(0),
        r.getDate(1).toLocalDate.getDayOfWeek.getValue, r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case (cell, rs) =>
      val s = rs.map(_._3).sum
      assert(math.abs(s) < 1e-3 * rs.length,
        s"cell $cell adjusted sum $s not ~0")
    }
  }

  test("A/B lift: arms partition the users and the readout is consistent") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.abLift(events).collect()
    assert(rows.nonEmpty)
    val users = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (t, nc, nt) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nc + nt == users(t), s"$t: arms $nc+$nt != users ${users(t)}")
      val (mc, mt, la) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(la - (mt - mc)) < 2e-6, s"$t lift inconsistent")
    }
  }

  test("native session_window: gap law holds and events are conserved") {
    import org.apache.spark.sql.functions._
    val gapUs = Analytics.SessionGapSec * 1000000L
    val rows = Analytics.windowSessionNative.run(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per user: sessions ordered, separated by more than the gap,
    // end = some event + gap (end - start >= gap)
    rows.groupBy(_._1).foreach { case (u, ss0) =>
      val ss = ss0.sortBy(_._2)
      ss.foreach { s => assert(s._3 - s._2 >= gapUs, s"user $u short end") }
      ss.sliding(2).map(_.toSeq).foreach {
        case Seq(a, b) =>
          // next first event > prev last event + gap ⇔ start >= prev end
          assert(b._2 >= a._3,
            s"user $u: session at ${b._2} starts before ${a._3}")
        case _ =>
      }
    }
    // session event counts conserve the event table
    val total = events.count()
    assert(rows.map(_._4).sum == total)
  }

  test("windowed funnel never advances a user past the unbounded funnel") {
    val unb = Analytics.funnelConversion(events).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val win = Analytics.funnelWindowed(events).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(win.keySet == unb.keySet, "stage-1 population differs")
    win.foreach { case (u, s) =>
      assert(s <= unb(u), s"user $u: windowed stage $s > unbounded ${unb(u)}")
    }
    // and the window must actually bind somewhere on the fixture,
    // otherwise the entry degenerates to the unbounded form
    assert(win.exists { case (u, s) => s < unb(u) },
      "attribution windows never bound a conversion on the fixture")
  }

  test("spike flags are scale-equivariant: doubling every count preserves them") {
    // (c*n - s1)^2 > 4(n*s2 - s1^2) is homogeneous of degree 2 in the
    // counts, so duplicating the event stream (every daily count ×2)
    // must flag exactly the same (type, day) cells.
    val doubled = events.union(events)
    val base = Analytics.anomalySpikes(events).collect()
      .map(r => (r.getString(0), r.get(1).toString) -> r.getBoolean(3)).toMap
    val twice = Analytics.anomalySpikes(doubled).collect()
      .map(r => (r.getString(0), r.get(1).toString) -> r.getBoolean(3)).toMap
    assert(base == twice)
    assert(base.values.exists(identity), "no spike on the fixture")
  }

  test("RFM quartiles are monotone in their dimension") {
    val rows = Analytics.rfmSegments(events).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    // same or smaller recency can never land in a LARGER quartile, etc.
    val byR = rows.sortBy(_._1).map(_._4)
    assert(byR.zip(byR.tail).forall { case (a, b) => a <= b })
    val byF = rows.sortBy(_._2).map(_._5)
    assert(byF.zip(byF.tail).forall { case (a, b) => a <= b })
    val byM = rows.sortBy(_._3).map(_._6)
    assert(byM.zip(byM.tail).forall { case (a, b) => a <= b })
    // all four quartiles realized in at least one dimension
    assert(rows.map(_._5).distinct.length >= 3, "frequency quartiles degenerate")
  }

  test("Holt trend: forecast = level + trend, and each type's trend " +
    "sign agrees with its daily-count regression slope") {
    import org.apache.spark.sql.functions._
    val got = Analytics.eventsHolt.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (ty, l, t, f) =>
      assert(math.abs(f - (l + t)) < 2e-6, s"$ty forecast != level+trend")
    }
    // regression slope per type over (day index, count)
    val slope = Tables.df(spark, TestSpark.Sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(expr("regr_slope(cnt, cast(datediff(day, date'2020-01-01') as double))")
        .as("b"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Holt's trend needn't equal the global slope, but a clearly-sloped
    // series must agree in SIGN where the slope is non-trivial
    got.foreach { case (ty, _, t, _) =>
      val b = slope(ty)
      if (math.abs(b) > 0.2)
        assert(t.sign == b.sign, s"$ty: holt trend $t vs slope $b")
    }
  }

  test("forecast backtest: flag consistent with the MAEs, both " +
    "positive, one eval per post-first day") {
    import org.apache.spark.sql.functions._
    val rows = Analytics.eventsForecastEval.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val nDays = Tables.df(spark, TestSpark.Sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (ty, n, hm, nm, beats) =>
      assert(n == nDays(ty) - 1, s"$ty evals $n != days-1")
      assert(hm > 0 && nm > 0, s"$ty degenerate MAE")
      assert(beats == (hm < nm) || math.abs(hm - nm) < 2e-6,
        s"$ty flag inconsistent: $hm vs $nm")
    }
  }

  test("Neyman allocation: within budget, monotone in N_h*S_h") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Corpus.sampleNeymanQ.run(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._4).sum
    assert(total <= graft.operators.Corpus.NeymanBudget,
      s"allocated $total over budget")
    // floors lose at most one unit per stratum
    assert(total > graft.operators.Corpus.NeymanBudget - rows.length,
      s"allocated only $total")
    // bigger N_h*sd_h never gets a smaller allocation
    val byW = rows.sortBy(r => r._2 * r._3).map(_._4)
    assert(byW.zip(byW.tail).forall { case (a, b) => a <= b },
      "allocation not monotone in stratum weight")
  }

  test("Kaplan-Meier: censored subjects leave the risk set without " +
    "registering an event (textbook hand-computed curve)") {
    import spark.implicits._
    // classic 5-subject example: events at t=1,3,4; censored at t=2,5.
    // t=1: n=5 d=1 -> 4/5 = 0.8
    // t=3: n=3 d=1 -> 0.8 * 2/3 = 0.533333
    // t=4: n=2 d=1 -> 0.533333... * 1/2 = 0.266667
    val lv = Seq((1L, false), (2L, true), (3L, false), (4L, false),
      (5L, true)).toDF("life", "censored")
    val got = Analytics.kmCurve(lv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq((1L, 5L, 1L, 0.8), (3L, 3L, 1L, 0.533333),
      (4L, 2L, 1L, 0.266667)),
      s"KM curve diverged from the hand computation: $got")
    // no-censoring degeneration: KM equals the empirical survivor fn
    val all = Seq((1L, false), (1L, false), (2L, false), (3L, false))
      .toDF("life", "censored")
    val gotAll = Analytics.kmCurve(all).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(gotAll == Seq((1L, 0.5), (2L, 0.25), (3L, 0.0)))
    // and the entry's fixture curve is monotone nonincreasing from < 1
    val curve = Analytics.eventsSurvivalKm.run(spark, TestSpark.Sf)
      .collect().map(_.getDouble(3)).toSeq
    assert(curve.nonEmpty && curve.head < 1.0 &&
      curve.zip(curve.tail).forall { case (a, b) => b <= a })
  }
}
