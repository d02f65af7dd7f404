package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Approximate aggregates as DATA-CHECKED entries (beyond-reference
  * surface). Sketch internals (HLL++ registers, KLL/GK quantile
  * summaries) differ per engine, so the sketch VALUE has no cross-engine
  * oracle — but the entries are still fully hash-compared: each computes
  * the approximate AND the exact answer in the same query, then projects
  * only the exact values plus the error-bound FLAG. The flag is
  * deterministic given the bound holds (and `ApproxSpec` asserts it
  * holds with margin), so DuckDB can oracle it as a literal `true`
  * alongside the independently-computed exact columns.
  *
  * Scale note: this is the 100 TB pattern for validating sketches —
  * both sides are single-pass distributed aggregates; nothing is
  * collected to the driver.
  */
object Approx {

  /** HLL++ relative standard deviation default (Spark): 5%. The bound
    * checked is 3σ-ish at 15% — loose enough to be deterministic-safe,
    * tight enough to catch a broken sketch. */
  val DistinctEps = 0.15

  val approxDistinct: Q = Q.df(
    "approx_distinct_bounds",
    """select o_orderpriority,
      |  cast(count(distinct o_custkey) as bigint) as exact_nd,
      |  true as within_eps
      |from orders group by o_orderpriority
      |order by o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_nd"),
        approx_count_distinct(col("o_custkey")).as("approx_nd"))
      .withColumn("rel_err",
        abs(col("approx_nd") - col("exact_nd")).cast("double")
          / col("exact_nd").cast("double"))
      .withColumn("within_eps", col("rel_err") <= DistinctEps)
      // The sketch value and its error are engine-internal; the
      // hash-compared surface is the exact count + the bound flag.
      .select(col("o_orderpriority"), col("exact_nd"), col("within_eps"))
      .orderBy(col("o_orderpriority"))
  }

  /** Rank-error bound for the quantile sketch: the TRUE rank of the
    * approximate median must sit within eps of 0.5. This is the bound
    * the sketch actually promises (rank error, not value error). */
  val PercentileRankEps = 0.02

  val approxPercentile: Q = Q.df(
    "approx_percentile_bounds",
    """select cast(count(*) as bigint) as n, true as within_eps
      |from lineitem""".stripMargin) { (s, dir) =>
    val li = Tables.df(s, dir, "lineitem")
    val ap = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("approx_p50"))
    li.crossJoin(broadcast(ap))
      .groupBy(col("approx_p50"))
      .agg(
        count(lit(1)).as("n"),
        (sum(when(col("l_extendedprice") <= col("approx_p50"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)).cast("double"))
          .as("rank_of_approx"))
      .withColumn("within_eps",
        col("rank_of_approx").between(0.5 - PercentileRankEps,
          0.5 + PercentileRankEps))
      // approx_p50 / its rank are sketch-dependent; the compared surface
      // is the exact row count + the rank-error bound flag.
      .select(col("n"), col("within_eps"))
  }

  /** Statistical moments (stddev/variance/correlation) — beyond-reference
    * aggregates. The builtin implementations are numerically
    * engine-specific (Welford updates accumulate differently per
    * partitioning), so the HASH-COMPARED columns are the exact integer
    * power sums (l_quantity is integral 1..50, l_linenumber int — bigint
    * sums are exact in any engine and any partitioning) plus each moment
    * evaluated ONCE from those sums via a fixed IEEE expression: every
    * +,-,*,/,sqrt is correctly rounded, so the same expression tree is
    * bit-identical cross-engine. The builtins are additionally checked
    * against the same references to 1e-9 and surfaced as a boolean. */
  val MomentsTol = 1e-9

  val statsMoments: Q = Q.df(
    "agg_stats_moments",
    s"""with s as (
       |  select cast(count(*) as bigint) as n,
       |    cast(sum(cast(l_quantity as bigint)) as bigint) as sx,
       |    cast(sum(cast(l_quantity as bigint) * cast(l_quantity as bigint))
       |      as bigint) as sxx,
       |    cast(sum(cast(l_linenumber as bigint)) as bigint) as sy,
       |    cast(sum(cast(l_linenumber as bigint) * cast(l_linenumber as bigint))
       |      as bigint) as syy,
       |    cast(sum(cast(l_quantity as bigint) * cast(l_linenumber as bigint))
       |      as bigint) as sxy,
       |    var_samp(l_quantity) as var_b, stddev_samp(l_quantity) as sd_b,
       |    corr(l_quantity, cast(l_linenumber as double)) as corr_b
       |  from lineitem),
       |m as (
       |  select *,
       |    (cast(sxx as double) - cast(sx as double) * cast(sx as double)
       |       / cast(n as double)) / (cast(n as double) - 1) as var_ref,
       |    sqrt((cast(sxx as double) - cast(sx as double) * cast(sx as double)
       |       / cast(n as double)) / (cast(n as double) - 1)) as sd_ref,
       |    (cast(sxy as double) - cast(sx as double) * cast(sy as double)
       |       / cast(n as double))
       |      / sqrt((cast(sxx as double) - cast(sx as double) * cast(sx as double)
       |            / cast(n as double))
       |          * (cast(syy as double) - cast(sy as double) * cast(sy as double)
       |            / cast(n as double))) as corr_ref
       |  from s)
       |select n, sx, sxx, sy, syy, sxy, var_ref, sd_ref, corr_ref,
       |  (abs(var_b - var_ref) / var_ref <= $MomentsTol
       |   and abs(sd_b - sd_ref) / sd_ref <= $MomentsTol
       |   and abs(corr_b - corr_ref) <= $MomentsTol) as within_tol
       |from m""".stripMargin) { (s, dir) =>
    val li = Tables.df(s, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("x"),
        col("l_linenumber").cast("long").as("y"))
    val agg = li.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"),
      var_samp(col("x").cast("double")).as("var_b"),
      stddev_samp(col("x").cast("double")).as("sd_b"),
      corr(col("x").cast("double"), col("y").cast("double")).as("corr_b"))
    def d(c: String) = col(c).cast("double")
    agg
      .withColumn("var_ref", (d("sxx") - d("sx") * d("sx") / d("n")) / (d("n") - lit(1.0)))
      .withColumn("sd_ref",
        sqrt((d("sxx") - d("sx") * d("sx") / d("n")) / (d("n") - lit(1.0))))
      .withColumn("corr_ref",
        (d("sxy") - d("sx") * d("sy") / d("n"))
          / sqrt((d("sxx") - d("sx") * d("sx") / d("n"))
            * (d("syy") - d("sy") * d("sy") / d("n"))))
      .select(col("n"), col("sx"), col("sxx"), col("sy"), col("syy"), col("sxy"),
        col("var_ref"), col("sd_ref"), col("corr_ref"),
        (abs(col("var_b") - col("var_ref")) / col("var_ref") <= MomentsTol &&
          abs(col("sd_b") - col("sd_ref")) / col("sd_ref") <= MomentsTol &&
          abs(col("corr_b") - col("corr_ref")) <= MomentsTol).as("within_tol"))
  }

  /** Count-Min-Sketch heavy hitters — the third sketch family (after
    * HLL distinct and KLL quantiles), data-checked the same way: the
    * exact top-k document frequencies are the compared surface, and the
    * sketch contributes only its one PROVABLE property as a flag — CMS
    * never underestimates (cells only ever increment), so
    * `cms_overestimates_ok` is deterministically true for a working
    * sketch. Both passes are single-scan distributed aggregates
    * (`count_min_sketch` is a builtin aggregate; the exact top-k is
    * [[Corpus.frequentNgrams]]'s TakeOrderedAndProject); only the
    * fixed-size sketch binary and the k report rows reach the driver. */
  val approxHeavyHitters: Q = Q.df(
    "approx_heavy_hitters_bounds", {
      val k = Corpus.TopGrams
      s"""with toks as (select doc_id, string_split(text, ' ') as t
         |              from documents),
         |sh as (select distinct doc_id,
         |         unnest(${graft.functions.Text.sqlTrigramList("t")}) as g
         |       from toks)
         |select g, cast(count(*) as bigint) as df,
         |  true as cms_overestimates_ok
         |from sh group by g
         |order by df desc, g limit $k""".stripMargin
    }) { (s, dir) =>
    val docs = Tables.df(s, dir, "documents")
    val grams = docs.select(
      explode(graft.functions.Text.shingles(col("text"), 3)).as("g"))
    val cmsBytes = grams
      .agg(expr("count_min_sketch(g, cast(0.0001 as double), " +
        "cast(0.99 as double), 42)").as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(cmsBytes)
    val top = Corpus.frequentNgrams(docs, Corpus.TopGrams).collect()
    import s.implicits._
    top.toSeq
      .map { r =>
        // probe with the same bytes the aggregate added (StringType
        // values go in as their UTF-8 binary)
        val est = cms.estimateCount(
          r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        (r.getString(0), r.getLong(1), est >= r.getLong(1))
      }
      .toDF("g", "df", "cms_overestimates_ok")
  }

  /** Shard count for the mergeable-sketch demonstration. */
  val SketchShards = 32

  /** Mergeable distinct-count sketches — the pattern that makes
    * cardinality work at 100 TB: each shard builds a DataSketches HLL
    * over ITS slice (`hll_sketch_agg`, one map-side-combined pass), the
    * shard sketches union via `hll_union_agg` WITHOUT touching raw data
    * again, and the merged estimate stands in for a global
    * count-distinct whose exact form would shuffle every key. Register
    * updates are max-based, so the merge is order- and
    * partitioning-independent. The hash-compared surface is the exact
    * count plus bound flags (the [[approxDistinct]] contract): the
    * merged estimate and every per-shard estimate must land within
    * [[DistinctEps]] of their exact counterparts. */
  val approxMergeable: Q = Q.df(
    "approx_distinct_mergeable",
    s"""select cast(count(distinct user_id % $SketchShards) as bigint)
       |    as n_shards,
       |  cast(count(distinct user_id) as bigint) as exact_nd,
       |  true as merged_within_eps,
       |  true as shards_within_eps
       |from events""".stripMargin) { (s, dir) =>
    val ev = Tables.df(s, dir, "events")
      .select(col("user_id"), (col("user_id") % SketchShards).as("shard"))
    val per = ev.groupBy(col("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("ex"))
      .withColumn("est", hll_sketch_estimate(col("sk")))
      .withColumn("ok",
        abs(col("est") - col("ex")).cast("double")
          / col("ex").cast("double") <= DistinctEps)
    val merged = per.agg(
      count(lit(1)).as("n_shards"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"),
      min(when(col("ok"), 1L).otherwise(0L)).as("all_ok"))
    val exact = ev.agg(countDistinct(col("user_id")).as("exact_nd"))
    exact.crossJoin(broadcast(merged))
      .select(col("n_shards"), col("exact_nd"),
        (abs(col("merged_est") - col("exact_nd")).cast("double")
          / col("exact_nd").cast("double") <= DistinctEps)
          .as("merged_within_eps"),
        (col("all_ok") === 1L).as("shards_within_eps"))
  }

  /** EXACT mergeable distinct counts via fixed-width bitmaps — the
    * dense-ID-space sibling of [[approxMergeable]]: when keys are dense
    * integers (user ids, product ids), `bitmap_construct_agg` packs each
    * 32768-wide bucket's membership into one binary value, buckets merge
    * with a byte-OR (`bitmap_or_agg`, order/partitioning-independent),
    * and `bitmap_count` reads the cardinality back — a count-distinct
    * whose shuffle carries |keys|/8 bytes per group instead of every
    * occurrence, and which (unlike HLL) is exact, so the oracle is plain
    * `count(distinct …)` equality, not an eps bound. Per-type counts
    * plus an 'ALL' row whose bitmaps are the per-type bitmaps OR-merged
    * AGAIN — proving the merge path, not just the single-level
    * aggregation. ids shift by +1 (bitmap positions are 1-based). */
  val bitmapDistinct: Q = Q.df(
    "agg_bitmap_distinct",
    """select event_type, cast(count(distinct user_id) as bigint) as nd
      |from events group by event_type
      |union all
      |select 'ALL' as event_type, cast(count(distinct user_id) as bigint)
      |from events
      |order by event_type""".stripMargin) { (s, dir) =>
    val ev = Tables.df(s, dir, "events")
      .select(col("event_type"), (col("user_id") + 1).as("uid"))
    val perBucket = ev
      .select(col("event_type"),
        bitmap_bucket_number(col("uid")).as("bkt"),
        bitmap_bit_position(col("uid")).as("pos"))
      .groupBy(col("event_type"), col("bkt"))
      .agg(bitmap_construct_agg(col("pos")).as("bm"))
    val perType = perBucket.groupBy(col("event_type"))
      .agg(sum(bitmap_count(col("bm"))).as("nd"))
    val overall = perBucket.groupBy(col("bkt"))
      .agg(bitmap_or_agg(col("bm")).as("bm"))
      .agg(sum(bitmap_count(col("bm"))).as("nd"))
      .select(lit("ALL").as("event_type"), col("nd"))
    perType.unionByName(overall)
      .select(col("event_type"), col("nd").cast("long").as("nd"))
      .orderBy(col("event_type"))
  }

  /** Persisted sketch rollup — the warehouse pattern the mergeable
    * sketches exist FOR: a daily job writes one (event_type, day, HLL)
    * row per cell to a sketch TABLE (binary column in parquet); later
    * rollups answer "distinct users per type / overall, any date range"
    * by merging the stored sketches — never re-reading the fact table.
    * This entry executes the whole loop: build per-(type, day) sketches,
    * persist to parquet, read BACK, union per type and overall. Gate
    * surface is the [[approxDistinct]] contract (exact count + within-eps
    * flags), since sketch bytes are engine-internal. */
  val approxSketchRollup: Q = Q.df(
    "approx_sketch_rollup",
    """select event_type,
      |  cast(count(distinct user_id) as bigint) as exact_nd,
      |  true as within_eps
      |from events group by event_type
      |union all
      |select 'ALL', cast(count(distinct user_id) as bigint), true
      |from events
      |order by event_type""".stripMargin) { (s, dir) =>
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sketch_").toString
    val ev = Tables.df(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"))
    // the daily sketch-build job
    ev.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(tmp)
    // the rollup job: persisted sketches only, no fact-table access
    val sk = s.read.parquet(tmp)
    val perType = sk.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val overall = sk.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .select(lit("ALL").as("event_type"), col("est"))
    val est = perType.unionByName(overall)
    // exact side for the gate surface
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_nd"))
      .unionByName(ev.agg(countDistinct(col("user_id")).as("exact_nd"))
        .select(lit("ALL").as("event_type"), col("exact_nd")))
    exact.join(est, Seq("event_type"))
      .select(col("event_type"), col("exact_nd"),
        (abs(col("est") - col("exact_nd")).cast("double")
          / col("exact_nd").cast("double") <= DistinctEps).as("within_eps"))
      .orderBy(col("event_type"))
  }

  /** Persisted TOP-K sketch rollup — Spark 4's DataSketches
    * frequent-items trio (approx_top_k_accumulate / _combine /
    * _estimate) run in the same warehouse shape as the HLL rollup: a
    * daily job persists one frequency sketch per day, and the rollup
    * merges the STORED sketches to answer "top event types over any
    * range" without re-reading facts. With the tracked-item budget
    * above the domain cardinality (20 ≫ 5 event types) the sketch
    * never evicts, so its counts are EXACT and the entry is
    * hash-oracle-able; the final ranking re-sorts the estimates
    * deterministically ((count desc, item)) rather than trusting the
    * sketch's internal tie order. At true heavy-hitter scale the same
    * code runs with the budget ≪ domain and the CMS/Misra-Gries
    * entries' epsilon contracts take over. */
  val approxTopKRollup: Q = Q.df(
    "approx_topk_sketch_rollup",
    """select event_type, cast(count(*) as bigint) as cnt
      |from events group by event_type
      |order by cnt desc, event_type limit 3""".stripMargin) { (s, dir) =>
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_topk_").toString
    val ev = Tables.df(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
    ev.groupBy(col("day"))
      .agg(expr("approx_top_k_accumulate(event_type, 20)").as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val sk = s.read.parquet(tmp)
    sk.agg(expr(
        "approx_top_k_estimate(approx_top_k_combine(sk, 20), 5)").as("e"))
      .select(explode(col("e")).as("x"))
      .select(col("x.item").as("event_type"),
        col("x.count").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(3)
  }

  /** Misra-Gries counter budget: bounds BOTH the per-partition summary
    * memory and the selection threshold (heavy = count·k > n). */
  val MgCounters = 64

  /** Per-partition Misra-Gries summaries → the distinct candidate-key
    * set. The MG invariant gives the pigeonhole SUPERSET guarantee: any
    * key with global count > n/k has per-partition count > n_p/k in at
    * least one partition (counts and sizes both sum to the totals), and
    * a key with partition count > n_p/k always survives that
    * partition's k-counter summary — so no true heavy hitter can be
    * pruned. Classic decrement-all eviction; O(k) memory per partition
    * regardless of key cardinality. */
  def misraGriesCandidates(toks: org.apache.spark.sql.Dataset[String],
      k: Int): org.apache.spark.sql.DataFrame = {
    import toks.sparkSession.implicits._
    toks.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters(t) = c + 1
          case None if counters.size < k => counters(t) = 1L
          case None =>
            // decrement-all: drains one unit from every counter (the
            // arriving key's implicit counter included) — the MG step
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters(key) = c - 1
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("tok").distinct()
  }

  /** Two-phase exact heavy hitters: Misra-Gries candidate pruning, then
    * exact verification over candidate rows only — the summarize-then-
    * verify shape that finds exact heavy keys WITHOUT ever shuffling
    * the full key space. Phase 1 is a map-only pass emitting ≤ k keys
    * per partition; phase 2 broadcast-semi-joins the candidate set and
    * aggregates just those rows, so at 100 TB the shuffle carries
    * candidate-key rows instead of billions of distinct keys, and the
    * final answer is exact and deterministic (the superset guarantee
    * means pruning can never change it — the fixtures' near-uniform
    * vocabulary keeps every word a candidate here, while ApproxSpec
    * proves real pruning and the superset property on synthetic
    * Zipf-skewed data where distinct keys far exceed k). The CMS entry
    * ([[approxHeavyHitters]]) bounds estimates; this one returns the
    * exact set. */
  val misraGriesHitters: Q = Q.df(
    "approx_misra_gries_hitters",
    s"""with toks as (select unnest(string_split(text, ' ')) as tok
       |              from documents),
       |t2 as (select tok from toks where len(tok) > 0),
       |tot as (select cast(count(*) as bigint) as n from t2)
       |select tok, cast(count(*) as bigint) as cnt
       |from t2, tot
       |group by tok, n
       |having count(*) * $MgCounters > n
       |order by cnt desc, tok""".stripMargin) { (s, dir) =>
    import s.implicits._
    val toks = Tables.df(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val cands = misraGriesCandidates(toks.as[String], MgCounters)
    val tot = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(cands), "tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * MgCounters > col("n"))
      .select(col("tok"), col("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Count-Min sketch geometry: [[CmRows]] pairwise-independent hash
    * rows × [[CmWidth]] counters. Hashes are `((a·(k mod p) + b) mod p)
    * mod w` with p prime and a < 10³, so every product stays ≤ 10⁹ —
    * exact int64 in BOTH engines (no black-box hash the oracle can't
    * replay). Width 512 on ~10³ fixture keys keeps estimates tight but
    * collisions real (the overestimate property is exercised, not
    * vacuous). */
  val CmRows = 4
  val CmWidth = 512L
  val CmP = 1000003L
  val CmA = Seq(131L, 241L, 337L, 443L)
  val CmB = Seq(17L, 29L, 41L, 53L)

  /** Point-query keys: the deterministic low-id user slice. */
  val CmQueryKeys = 20

  private def cmHashSql(i: Int, k: String): String =
    s"((${CmA(i)} * ($k % $CmP) + ${CmB(i)}) % $CmP) % $CmWidth"

  /** COUNT-MIN SKETCH point estimation (Cormode/Muthukrishnan) — the
    * third sketch family beside HLL (distinct) and Misra-Gries (heavy
    * hitters): a d×w counter matrix answering "how many times did key k
    * occur" with one-sided error, est ≥ true, P[est > true + εN] ≤ δ.
    * The matrix builds as ONE map-side-combined groupBy over (row,
    * bucket) — d×w rows total, broadcastable at any corpus size, and
    * MERGEABLE by counter addition (the shard-then-merge deployment the
    * HLL rollup entries model). Point queries join the query keys'
    * d bucket coordinates against the broadcast matrix and take the
    * per-key MIN. The entry emits exact count + estimate side by side;
    * the one-sided overestimate guarantee (`est_n >= exact_n`, an
    * algebraic identity of the structure) ships as a value-checked
    * column, and the oracle replays the integer hash arithmetic
    * exactly — no black-box hashing anywhere. */
  val countMinPoint: Q = Q.df(
    "approx_countmin_point", {
      val hashes = (0 until CmRows).map(i =>
        s"select user_id, $i as i, ${cmHashSql(i, "user_id")} as b from ev")
        .mkString(" union all ")
      s"""with ev as (select user_id from events),
         |coords as ($hashes),
         |sketch as (select i, b, cast(count(*) as bigint) as c
         |           from coords group by i, b),
         |qk as (select distinct user_id from ev
         |       where user_id < $CmQueryKeys),
         |qc as (${(0 until CmRows).map(i =>
          s"select user_id, $i as i, ${cmHashSql(i, "user_id")} as b from qk")
          .mkString(" union all ")}),
         |est as (select qc.user_id, min(s.c) as est_n
         |        from qc join sketch s on s.i = qc.i and s.b = qc.b
         |        group by qc.user_id),
         |exact as (select user_id, cast(count(*) as bigint) as exact_n
         |          from ev where user_id < $CmQueryKeys group by user_id)
         |select e.user_id, e.exact_n, cast(t.est_n as bigint) as est_n,
         |  t.est_n >= e.exact_n as overestimates
         |from exact e join est t on t.user_id = e.user_id
         |order by e.user_id""".stripMargin
    }) { (s, dir) =>
    val ev = Tables.df(s, dir, "events").select(col("user_id"))
    def coords(src: org.apache.spark.sql.DataFrame) = src.select(
      col("user_id"),
      posexplode(array((0 until CmRows).map(i =>
        expr(cmHashSql(i, "user_id"))): _*)))
      .toDF("user_id", "i", "b")
    val sketch = coords(ev).groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("c"))
    val qk = ev.filter(col("user_id") < CmQueryKeys).distinct()
    val est = coords(qk)
      .join(broadcast(sketch), Seq("i", "b"))
      .groupBy(col("user_id")).agg(min(col("c")).as("est_n"))
    val exact = ev.filter(col("user_id") < CmQueryKeys)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
    exact.join(est, Seq("user_id"))
      .select(col("user_id"), col("exact_n"), col("est_n"),
        (col("est_n") >= col("exact_n")).as("overestimates"))
      .orderBy(col("user_id"))
  }

  /** KMV/theta sketch size (nominal k). */
  val KmvK = 64

  /** The two populations the set algebra runs over: custkeys ordering
    * in each of these years. */
  val ThetaYears: Seq[Int] = Seq(1996, 1997)

  /** Hash range for the KMV sketch: the Knuth multiplicative mixer mod
    * 2³² (the [[graft.operators.Corpus]] split hash) — the count-min
    * affine family does NOT wrap on fixture-sized keys (131·custkey
    * never exceeds p), leaving minima correlated with key order and
    * the estimator biased; the 2654435761 multiplier equidistributes
    * mod 2³² and stays exact int64 in both engines. */
  val KmvRange = 4294967296L
  val KmvMult = 2654435761L

  /** THETA-SKETCH SET OPERATIONS (the Dataiku/DataSketches theta
    * family; KMV estimator, Bar-Yossef et al. 2002): a distinct-count
    * sketch that — unlike HLL — supports INTERSECTION and DIFFERENCE,
    * the set algebra audience-overlap / retention queries need. Each
    * population keeps its k smallest hash values; θ = the kth smallest
    * (or the full hash range when the set is smaller than k — the
    * sketch then IS the set and every estimate is exact). A sketch is
    * the retained sample {h < θ}, and every operation is sample
    * algebra at a combined θ = min(θ_A, θ_B): union merges samples,
    * intersection intersects them, difference anti-joins — each
    * estimate is |S|·p/θ, ONE division.
    *
    * The hash is the replayable Knuth multiplicative mixer
    * (`(k · 2654435761) mod 2³²`), so the ORACLE REPLAYS THE SKETCH
    * ITSELF and the estimates hash-match. Exact per-op cardinalities
    * ship beside the estimates (error visible as data).
    *
    * Scale shape: the k-smallest sample is `orderBy(h).limit(k)` —
    * Spark's TakeOrderedAndProject, a map-side partial top-k per
    * partition merged on one reducer with k rows per partition in
    * flight, never a global sort; everything after operates on ≤ 2k-row
    * broadcast frames. Exactly how a sketch library shards: per-split
    * k-minima, mergeable by re-taking k smallest. */
  val thetaSetops: Q = Q.df(
    "approx_theta_setops", {
      val (y1, y2) = (ThetaYears.head, ThetaYears(1))
      val h = s"((o_custkey * $KmvMult) % $KmvRange)"
      def est(ns: String, th: String) =
        s"round(cast($ns * $KmvRange as double) / cast($th as double), 4)"
      s"""with oy as (select distinct $h as h, year(o_orderdate) as yr
         |  from orders where year(o_orderdate) in ($y1, $y2)),
         |ha as (select h from oy where yr = $y1),
         |hb as (select h from oy where yr = $y2),
         |sa as (select h from ha order by h limit $KmvK),
         |sb as (select h from hb order by h limit $KmvK),
         |ta as (select case when (select count(*) from sa) >= $KmvK
         |         then (select max(h) from sa) else $KmvRange end as th),
         |tb as (select case when (select count(*) from sb) >= $KmvK
         |         then (select max(h) from sb) else $KmvRange end as th),
         |ra as (select h from sa, ta where h < ta.th),
         |rb as (select h from sb, tb where h < tb.th),
         |tm as (select least(ta.th, tb.th) as th from ta, tb),
         |ru as (select distinct h
         |       from (select h from ra union all select h from rb) u, tm
         |       where h < tm.th),
         |ri as (select ra.h from ra join rb using (h), tm
         |       where ra.h < tm.th),
         |rd as (select ra.h from ra left join rb using (h), tm
         |       where rb.h is null and ra.h < tm.th),
         |ex as (select
         |    (select count(*) from ha) as e_a,
         |    (select count(*) from hb) as e_b,
         |    (select count(*) from (select h from ha union
         |                           select h from hb)) as e_u,
         |    (select count(*) from ha join hb using (h)) as e_i,
         |    (select count(*) from ha left join hb using (h)
         |     where hb.h is null) as e_d)
         |select op, n_retained, theta,
         |  ${est("n_retained", "theta")} as est_distinct, exact_distinct
         |from (
         |  select 'a' as op, (select count(*) from ra) as n_retained,
         |    ta.th as theta, ex.e_a as exact_distinct from ta, ex
         |  union all
         |  select 'b', (select count(*) from rb), tb.th, ex.e_b
         |  from tb, ex
         |  union all
         |  select 'union', (select count(*) from ru), tm.th, ex.e_u
         |  from tm, ex
         |  union all
         |  select 'intersect', (select count(*) from ri), tm.th, ex.e_i
         |  from tm, ex
         |  union all
         |  select 'diff', (select count(*) from rd), tm.th, ex.e_d
         |  from tm, ex) t
         |order by op""".stripMargin
    }) { (s, dir) =>
    val (y1, y2) = (ThetaYears.head, ThetaYears(1))
    val orders = Tables.df(s, dir, "orders")
    def hashes(y: Int): DataFrame = orders
      .filter(year(col("o_orderdate")) === y)
      .select(((col("o_custkey") * KmvMult) % KmvRange).as("h"))
      .distinct()
    val ha = hashes(y1)
    val hb = hashes(y2)
    // TakeOrderedAndProject: per-partition k-minima, one k-row merge
    def sketch(hs: DataFrame): (DataFrame, DataFrame) = {
      val sample = hs.orderBy(col("h")).limit(KmvK)
      val theta = sample
        .agg(count(lit(1)).as("n"), max(col("h")).as("mx"))
        .select(when(col("n") >= KmvK, col("mx")).otherwise(lit(KmvRange))
          .as("th"))
      val retained = sample.crossJoin(broadcast(theta))
        .filter(col("h") < col("th")).select(col("h"))
      (retained, theta)
    }
    val (ra, ta) = sketch(ha)
    val (rb, tb) = sketch(hb)
    val tm = ta.select(col("th").as("tha"))
      .crossJoin(tb.select(col("th").as("thb")))
      .select(least(col("tha"), col("thb")).as("th"))
    def under(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(tm)).filter(col("h") < col("th"))
        .select(col("h"))
    val ru = under(ra.unionByName(rb)).distinct()
    val ri = under(ra.join(rb, Seq("h"), "left_semi"))
    val rd = under(ra.join(rb, Seq("h"), "left_anti"))
    def row(op: String, retained: DataFrame, theta: DataFrame,
        exact: DataFrame): DataFrame =
      retained.agg(count(lit(1)).as("n_retained"))
        .crossJoin(theta).crossJoin(exact)
        .select(lit(op).as("op"), col("n_retained"), col("th").as("theta"),
          round((col("n_retained") * KmvRange).cast("double") /
            col("th").cast("double"), 4).as("est_distinct"),
          col("e").as("exact_distinct"))
    def cnt(df: DataFrame): DataFrame = df.agg(count(lit(1)).as("e"))
    row("a", ra, ta, cnt(ha))
      .unionByName(row("b", rb, tb, cnt(hb)))
      .unionByName(row("union", ru, tm,
        cnt(ha.unionByName(hb).distinct())))
      .unionByName(row("intersect", ri, tm,
        cnt(ha.join(hb, Seq("h"), "left_semi"))))
      .unionByName(row("diff", rd, tm,
        cnt(ha.join(hb, Seq("h"), "left_anti"))))
      .orderBy(col("op"))
  }

  val queries: Seq[Q] =
    Seq(approxDistinct, approxPercentile, statsMoments, approxHeavyHitters,
      approxMergeable, bitmapDistinct, approxSketchRollup, approxTopKRollup,
      misraGriesHitters, countMinPoint, thetaSetops)
}
