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

  val queries: Seq[Q] = Seq(joinSalted)
}
