package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Skew mitigation for shuffle joins (the 100 TB tool the brief names:
  * "salting for skew"). A hot join key sends its entire probe-side
  * volume to one reducer; salting scatters it: probe rows get a
  * deterministic salt in [0, salt), the build side is replicated once
  * per salt value, and the join key becomes (key, salt). The result is
  * bit-identical to the plain equi-join — proven by the oracle entry —
  * while the hot key's work spreads over `salt` reducers at the cost of
  * a salt× build-side replication (use with a bounded build side;
  * Spark's AQE skew-join handles the adaptive case, this is the static
  * form for when a skewed key set is known a priori).
  */
object Skew {

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int): DataFrame = {
    // deterministic scatter: hash the probe row, not rand() — keeps the
    // operator replayable (speculative tasks, retries) and testable
    val p = probe.withColumn("_salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(salt)).cast("int"))
    val b = build.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    p.join(b, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted join vs the plain-join oracle: identical output. The probe
    * side (lineitem) is keyed by a renamed column so the USING-style
    * join key lines up. */
  val joinSalted: Q = Q.df(
    "join_salted",
    """select l_orderkey, o_custkey, o_orderstatus from lineitem
      |join orders on l_orderkey = o_orderkey
      |where o_totalprice > 400000
      |order by l_orderkey, o_custkey""".stripMargin) { (s, dir) =>
    val probe = Tables.df(s, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_orderkey"))
    val build = Tables.df(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    saltedJoin(probe, build, "o_orderkey", salt = 8)
      .select(col("l_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .orderBy(col("l_orderkey"), col("o_custkey"))
  }

  /** Null-key skew split for OUTER joins: NULL join keys never match,
    * yet a plain shuffle hashes every NULL row to ONE reducer — on
    * fact tables where the foreign key is often absent (unattributed
    * events, anonymous sessions) that single reducer receives a huge
    * dead partition. The standard fix: route NULL-key rows around the
    * join entirely (they can only produce unmatched output) and union
    * them back, so the shuffle carries non-null keys only. Result is
    * bit-identical to the plain left join — proven by the oracle. */
  def nullSkewLeftJoin(probe: DataFrame, build: DataFrame,
      key: String): DataFrame = {
    val buildCols = build.columns.filterNot(_ == key)
    val nullSide = probe.filter(col(key).isNull)
      .select(probe.columns.map(col) ++
        buildCols.map(c => lit(null).cast(build.schema(c).dataType).as(c)): _*)
    val matchedSide = probe.filter(col(key).isNotNull)
      .join(build, Seq(key), "left")
    matchedSide.unionByName(nullSide.select(matchedSide.columns.map(col): _*))
  }

  /** Events LEFT JOIN a user-dimension built from customers, with the
    * foreign key nulled out for a large slice (every third event) to
    * model unattributed traffic — the null-skew regime. The oracle is
    * the plain left join; the Spark side routes the null slice around
    * the shuffle. */
  val joinNullSkew: Q = Q.df(
    "join_null_skew",
    """with e as (select event_id,
      |    case when event_id % 3 = 0 then null
      |         else user_id % 150 + 1 end as c_custkey
      |  from events),
      |d as (select c_custkey, c_nationkey from customer)
      |select e.event_id, e.c_custkey, d.c_nationkey
      |from e left join d using (c_custkey)
      |order by event_id""".stripMargin) { (s, dir) =>
    val e = Tables.df(s, dir, "events")
      .select(col("event_id"),
        when(col("event_id") % 3 === 0, lit(null))
          .otherwise(col("user_id") % 150 + 1).cast("long").as("c_custkey"))
    val d = Tables.df(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    nullSkewLeftJoin(e, d, "c_custkey")
      .select(col("event_id"), col("c_custkey"), col("c_nationkey"))
      .orderBy(col("event_id"))
  }

  val queries: Seq[Q] = Seq(joinSalted, joinNullSkew)
}
