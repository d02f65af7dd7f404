package graft.tpch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.{Q, Tables}
import graft.functions.Money._

/** TPC-H 1–22 re-expressed on the fixture schema (FIXTURES.md §2).
  *
  * The reference parses/plans all 22 (doradb-tpch-tests, /root/reference/
  * sql/tpch*.sql) but cannot execute them (phy is todo!()); we run them
  * end-to-end. Fixtures lack partsupp and several lineitem/orders columns
  * and use a 1995–2001 synthetic date range, so each query keeps its
  * operator SHAPE (the thing the reference's planner exercises — join
  * graph, agg, subquery pattern) with adapted predicates.
  *
  * Scale design: dimension tables (region, nation, supplier at this SF)
  * are broadcast; fact-fact joins shuffle on join keys and AQE handles
  * skew; every aggregate is partial-aggregated map-side by Catalyst.
  */
object Tpch {

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  private def rev: Column = discPrice(col("l_extendedprice"), col("l_discount"))
  private val sqlRev: String = sqlDiscPrice("l_extendedprice", "l_discount")

  // --- q1: pricing summary (Scan→Filt→Aggr→Sort; sum/avg/count) ---------
  val q1: Q = Q.df(
    "q1_pricing_summary",
    s"""select l_returnflag, l_linestatus,
       |  cast(sum(${sqlM("l_quantity")}) as double) as sum_qty,
       |  cast(sum(${sqlM("l_extendedprice")}) as double) as sum_base_price,
       |  cast(sum($sqlRev) as double) as sum_disc_price,
       |  cast(sum(${sqlCharge("l_extendedprice", "l_discount", "l_tax")}) as double) as sum_charge,
       |  cast(sum(${sqlM("l_quantity")}) as double) / count(l_quantity) as avg_qty,
       |  cast(sum(${sqlM("l_extendedprice")}) as double) / count(l_extendedprice) as avg_price,
       |  cast(sum(cast(l_discount as decimal(4,2))) as double) / count(l_discount) as avg_disc,
       |  count(*) as count_order
       |from lineitem
       |where l_shipdate <= timestamp '2001-08-06'
       |group by l_returnflag, l_linestatus
       |order by l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("2001-08-06"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(m(col("l_quantity"))).as("sum_qty"),
        dsum(m(col("l_extendedprice"))).as("sum_base_price"),
        dsum(rev).as("sum_disc_price"),
        dsum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
        davg(m(col("l_quantity"))).as("avg_qty"),
        davg(m(col("l_extendedprice"))).as("avg_price"),
        davg(col("l_discount").cast(R)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // --- q2: min-cost supplier (correlated scalar MIN subquery) -----------
  // Adapted: partsupp is absent; "cost" is the lineitem extended price.
  val q2: Q = Q.shared(
    "q2_min_cost_supplier",
    """select s.s_name, p.p_partkey, p.p_name, l.l_extendedprice
      |from part p, lineitem l, supplier s, nation n, region r
      |where p.p_partkey = l.l_partkey and l.l_suppkey = s.s_suppkey
      |  and s.s_nationkey = n.n_nationkey and n.n_regionkey = r.r_regionkey
      |  and r.r_name = 'EUROPE' and p.p_size < 15 and p.p_type = 'STANDARD'
      |  and l.l_extendedprice = (
      |    select min(l2.l_extendedprice)
      |    from lineitem l2, supplier s2, nation n2, region r2
      |    where l2.l_partkey = p.p_partkey and l2.l_suppkey = s2.s_suppkey
      |      and s2.s_nationkey = n2.n_nationkey and n2.n_regionkey = r2.r_regionkey
      |      and r2.r_name = 'EUROPE')
      |order by s.s_name, p.p_partkey""".stripMargin)

  // --- q3: shipping priority (3-way join, top-k) -------------------------
  val q3: Q = Q.df(
    "q3_shipping_priority",
    s"""select l_orderkey, cast(sum($sqlRev) as double) as revenue, o_orderdate
       |from customer, orders, lineitem
       |where c_mktsegment = 'BUILDING' and c_custkey = o_custkey
       |  and l_orderkey = o_orderkey
       |  and o_orderdate < timestamp '1997-06-01' and l_shipdate > timestamp '1997-06-01'
       |group by l_orderkey, o_orderdate
       |order by revenue desc, l_orderkey
       |limit 10""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.df(s, dir, "orders").filter(col("o_orderdate") < ts("1997-06-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.df(s, dir, "lineitem").filter(col("l_shipdate") > ts("1997-06-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
  }

  // --- q4: order priority checking (correlated EXISTS = semi join) ------
  // Adapted: no commit/receipt dates; "late" = shipped after order date.
  val q4: Q = Q.shared(
    "q4_order_priority",
    """select o_orderpriority, count(*) as order_count
      |from orders
      |where o_orderdate >= timestamp '1996-07-01' and o_orderdate < timestamp '1996-10-01'
      |  and exists (select * from lineitem
      |              where l_orderkey = o_orderkey and l_shipdate > o_orderdate)
      |group by o_orderpriority
      |order by o_orderpriority""".stripMargin)

  // --- q5: local supplier volume (6-way join incl. c=s nation) ----------
  val q5: Q = Q.df(
    "q5_local_supplier_volume",
    s"""select n_name, cast(sum($sqlRev) as double) as revenue
       |from customer, orders, lineitem, supplier, nation, region
       |where c_custkey = o_custkey and l_orderkey = o_orderkey
       |  and l_suppkey = s_suppkey and c_nationkey = s_nationkey
       |  and s_nationkey = n_nationkey and n_regionkey = r_regionkey
       |  and r_name = 'ASIA'
       |  and o_orderdate >= timestamp '1996-01-01' and o_orderdate < timestamp '1997-01-01'
       |group by n_name
       |order by revenue desc, n_name""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "customer")
      .join(Tables.df(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.df(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.df(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.df(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.df(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --- q6: forecasting revenue change (scalar aggregate) ----------------
  val q6: Q = Q.df(
    "q6_forecast_revenue",
    s"""select cast(sum(${sqlM("l_extendedprice")} * cast(l_discount as decimal(4,2))) as double) as revenue
       |from lineitem
       |where l_shipdate >= timestamp '1996-01-01' and l_shipdate < timestamp '1997-01-01'
       |  and l_discount between 0.05 and 0.07 and l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
        && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(m(col("l_extendedprice")) * col("l_discount").cast(R)).as("revenue"))
  }

  // --- q7: volume shipping between two nations (self-join on nation) ----
  val q7: Q = Q.df(
    "q7_volume_shipping",
    s"""select supp_nation, cust_nation, l_year, cast(sum(volume) as double) as revenue
       |from (
       |  select n1.n_name as supp_nation, n2.n_name as cust_nation,
       |    extract(year from l_shipdate) as l_year, $sqlRev as volume
       |  from supplier, lineitem, orders, customer, nation n1, nation n2
       |  where s_suppkey = l_suppkey and o_orderkey = l_orderkey
       |    and c_custkey = o_custkey and s_nationkey = n1.n_nationkey
       |    and c_nationkey = n2.n_nationkey
       |    and ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
       |      or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
       |    and l_shipdate between timestamp '1996-01-01' and timestamp '1997-12-31'
       |) shipping
       |group by supp_nation, cust_nation, l_year
       |order by supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
    val n1 = Tables.df(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.df(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.df(s, dir, "supplier")
      .join(Tables.df(s, dir, "lineitem")
          .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31"))),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.df(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.df(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
        || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(dsum(rev).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  // --- q8: national market share (CASE-in-aggregate ratio) --------------
  val q8: Q = Q.df(
    "q8_market_share",
    s"""select o_year,
       |  cast(sum(case when nation = 'NATION_3' then volume else 0 end) as double)
       |    / cast(sum(volume) as double) as mkt_share
       |from (
       |  select extract(year from o_orderdate) as o_year, $sqlRev as volume,
       |    n2.n_name as nation
       |  from part, supplier, lineitem, orders, customer, nation n1, nation n2, region
       |  where p_partkey = l_partkey and s_suppkey = l_suppkey
       |    and l_orderkey = o_orderkey and o_custkey = c_custkey
       |    and c_nationkey = n1.n_nationkey and n1.n_regionkey = r_regionkey
       |    and r_name = 'AMERICA' and s_nationkey = n2.n_nationkey
       |    and o_orderdate between timestamp '1996-01-01' and timestamp '1997-12-31'
       |    and p_type = 'ECONOMY'
       |) all_nations
       |group by o_year
       |order by o_year""".stripMargin) { (s, dir) =>
    val n1 = Tables.df(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = Tables.df(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    Tables.df(s, dir, "part").filter(col("p_type") === "ECONOMY")
      .join(Tables.df(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .join(Tables.df(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.df(s, dir, "orders")
          .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.df(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(Tables.df(s, dir, "region").filter(col("r_name") === "AMERICA")),
        col("n1_region") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"), rev.as("volume"), col("nation"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("nation") === "NATION_3", col("volume")).otherwise(lit(0))).cast("double")
        / sum(col("volume")).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  // --- q9: product-type profit (LIKE filter, year extract) --------------
  // Adapted: no partsupp → profit is just discounted revenue.
  val q9: Q = Q.df(
    "q9_product_profit",
    s"""select nation, o_year, cast(sum($sqlRev) as double) as sum_profit
       |from (
       |  select n_name as nation, extract(year from o_orderdate) as o_year,
       |    l_extendedprice, l_discount
       |  from part, supplier, lineitem, orders, nation
       |  where s_suppkey = l_suppkey and p_partkey = l_partkey
       |    and o_orderkey = l_orderkey and s_nationkey = n_nationkey
       |    and p_name like '%red%'
       |) profit
       |group by nation, o_year
       |order by nation, o_year desc""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "part").filter(col("p_name").like("%red%"))
      .join(Tables.df(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .join(Tables.df(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.df(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.df(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"), rev.as("volume"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("volume")).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  // --- q10: returned item reporting (group incl. passthrough cols) ------
  val q10: Q = Q.df(
    "q10_returned_items",
    s"""select c_custkey, c_name, cast(sum($sqlRev) as double) as revenue, c_acctbal, n_name
       |from customer, orders, lineitem, nation
       |where c_custkey = o_custkey and l_orderkey = o_orderkey
       |  and o_orderdate >= timestamp '1996-10-01' and o_orderdate < timestamp '1997-01-01'
       |  and l_returnflag = 'R' and c_nationkey = n_nationkey
       |group by c_custkey, c_name, c_acctbal, n_name
       |order by revenue desc, c_custkey
       |limit 20""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "customer")
      .join(Tables.df(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-10-01") && col("o_orderdate") < ts("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.df(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.df(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum(rev).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
  }

  // --- q11: important stock (HAVING > scalar subquery) -------------------
  // Adapted: partsupp absent → per-part lineitem value within one nation.
  val q11: Q = Q.shared(
    "q11_important_stock",
    s"""select l_partkey, cast(sum(${sqlM("l_extendedprice")}) as double) as value
       |from lineitem, supplier, nation
       |where l_suppkey = s_suppkey and s_nationkey = n_nationkey and n_name = 'NATION_7'
       |group by l_partkey
       |having cast(sum(${sqlM("l_extendedprice")}) as double) > (
       |  select cast(sum(${sqlM("l_extendedprice")}) as double) * 0.001
       |  from lineitem, supplier, nation
       |  where l_suppkey = s_suppkey and s_nationkey = n_nationkey and n_name = 'NATION_7')
       |order by value desc, l_partkey""".stripMargin)

  // --- q12: shipping modes / priority classes (CASE sums) ---------------
  // Adapted: no l_shipmode → classify by l_returnflag.
  val q12: Q = Q.df(
    "q12_priority_class",
    """select l_returnflag,
      |  cast(sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'
      |       then 1 else 0 end) as bigint) as high_line_count,
      |  cast(sum(case when o_orderpriority <> '1-URGENT' and o_orderpriority <> '2-HIGH'
      |       then 1 else 0 end) as bigint) as low_line_count
      |from orders, lineitem
      |where o_orderkey = l_orderkey
      |  and l_shipdate >= timestamp '1996-01-01' and l_shipdate < timestamp '1997-01-01'
      |group by l_returnflag
      |order by l_returnflag""".stripMargin) { (s, dir) =>
    val urgent = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    Tables.df(s, dir, "orders")
      .join(Tables.df(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  // --- q13: customer order-count distribution (left outer join) ---------
  val q13: Q = Q.df(
    "q13_customer_distribution",
    """select c_count, count(*) as custdist
      |from (
      |  select c_custkey, count(o_orderkey) as c_count
      |  from customer left outer join orders
      |    on c_custkey = o_custkey and o_orderpriority <> '1-URGENT'
      |  group by c_custkey
      |) c_orders
      |group by c_count
      |order by custdist desc, c_count desc""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "customer")
      .join(Tables.df(s, dir, "orders"),
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // --- q14: promotion effect (conditional ratio) -------------------------
  val q14: Q = Q.df(
    "q14_promo_effect",
    s"""select 100.0 * cast(sum(case when p_type = 'PROMO' then $sqlRev else 0 end) as double)
       |  / cast(sum($sqlRev) as double) as promo_revenue
       |from lineitem, part
       |where l_partkey = p_partkey
       |  and l_shipdate >= timestamp '1996-09-01' and l_shipdate < timestamp '1996-10-01'""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-09-01") && col("l_shipdate") < ts("1996-10-01"))
      .join(Tables.df(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).cast("double")
        / sum(rev).cast("double")).as("promo_revenue"))
  }

  // --- q15: top supplier (multi-referenced CTE + scalar MAX) -------------
  val q15: Q = Q.shared(
    "q15_top_supplier",
    s"""with revenue0 as (
       |  select l_suppkey as supplier_no, cast(sum($sqlRev) as double) as total_revenue
       |  from lineitem
       |  where l_shipdate >= timestamp '1996-01-01' and l_shipdate < timestamp '1996-04-01'
       |  group by l_suppkey)
       |select s_suppkey, s_name, total_revenue
       |from supplier, revenue0
       |where s_suppkey = supplier_no
       |  and total_revenue = (select max(total_revenue) from revenue0)
       |order by s_suppkey""".stripMargin)

  // --- q16: supplier count by part attrs (NOT IN + count distinct) ------
  val q16: Q = Q.shared(
    "q16_parts_supplier",
    """select p_brand, p_type, p_size, count(distinct l_suppkey) as supplier_cnt
      |from lineitem, part
      |where p_partkey = l_partkey
      |  and p_brand <> 'Brand#1'
      |  and p_size in (1, 3, 9, 14, 19, 23, 36, 45)
      |  and l_suppkey not in (select s_suppkey from supplier where s_name like '%11')
      |group by p_brand, p_type, p_size
      |order by supplier_cnt desc, p_brand, p_type, p_size""".stripMargin)

  // --- q17: small-quantity orders (correlated AVG subquery) -------------
  val q17: Q = Q.shared(
    "q17_small_qty_orders",
    s"""select cast(sum(${sqlM("l_extendedprice")}) as double) / 7.0 as avg_yearly
       |from lineitem, part
       |where p_partkey = l_partkey and p_brand = 'Brand#3'
       |  and l_quantity < (
       |    select 0.2 * avg(l_quantity) from lineitem l2 where l2.l_partkey = p_partkey)""".stripMargin)

  // --- q18: large-volume customers (IN + HAVING subquery, top-k) --------
  val q18: Q = Q.shared(
    "q18_large_volume_customer",
    s"""select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  cast(sum(${sqlM("l_quantity")}) as double) as sum_qty
       |from customer, orders, lineitem
       |where o_orderkey in (
       |    select l_orderkey from lineitem group by l_orderkey
       |    having sum(${sqlM("l_quantity")}) > 180)
       |  and c_custkey = o_custkey and o_orderkey = l_orderkey
       |group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       |order by o_totalprice desc, o_orderkey
       |limit 100""".stripMargin)

  // --- q19: discounted revenue (3-way disjunctive predicate) ------------
  val q19: Q = Q.df(
    "q19_disjunctive_revenue",
    s"""select cast(sum($sqlRev) as double) as revenue
       |from lineitem, part
       |where p_partkey = l_partkey and (
       |  (p_brand = 'Brand#12' and p_size between 1 and 5 and l_quantity between 1 and 11)
       |  or (p_brand = 'Brand#23' and p_size between 1 and 10 and l_quantity between 10 and 20)
       |  or (p_brand = 'Brand#4' and p_size between 1 and 15 and l_quantity between 20 and 30))""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "lineitem")
      .join(Tables.df(s, dir, "part"), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30)))
      .agg(dsum(rev).as("revenue"))
  }

  // --- q20: potential part promotion (nested IN + HAVING) ---------------
  val q20: Q = Q.shared(
    "q20_potential_promotion",
    s"""select s_name, s_acctbal
       |from supplier, nation
       |where s_suppkey in (
       |    select l_suppkey from lineitem
       |    where l_partkey in (select p_partkey from part where p_name like 'red%')
       |      and l_shipdate >= timestamp '1996-01-01' and l_shipdate < timestamp '1997-01-01'
       |    group by l_suppkey
       |    having sum(${sqlM("l_quantity")}) > 100)
       |  and s_nationkey = n_nationkey and n_name = 'NATION_5'
       |order by s_name""".stripMargin)

  // --- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) -----
  val q21: Q = Q.shared(
    "q21_suppliers_waiting",
    """select s_name, count(*) as numwait
      |from supplier, lineitem l1, orders, nation
      |where s_suppkey = l1.l_suppkey and o_orderkey = l1.l_orderkey
      |  and o_orderstatus = 'F' and l1.l_shipdate > o_orderdate
      |  and exists (select * from lineitem l2
      |              where l2.l_orderkey = l1.l_orderkey and l2.l_suppkey <> l1.l_suppkey)
      |  and not exists (select * from lineitem l3, orders o3
      |                  where o3.o_orderkey = l3.l_orderkey
      |                    and l3.l_orderkey = l1.l_orderkey
      |                    and l3.l_suppkey <> l1.l_suppkey
      |                    and l3.l_shipdate > o3.o_orderdate)
      |  and s_nationkey = n_nationkey and n_name = 'NATION_2'
      |group by s_name
      |order by numwait desc, s_name
      |limit 100""".stripMargin)

  // --- q22: global sales opportunity (substring + scalar AVG + anti) ----
  val q22: Q = Q.shared(
    "q22_sales_opportunity",
    s"""select cntrycode, count(*) as numcust,
       |  cast(sum(${sqlM("c_acctbal")}) as double) as totacctbal
       |from (
       |  select substring(c_name, 17, 2) as cntrycode, c_acctbal
       |  from customer
       |  where substring(c_name, 17, 2) in ('01', '12', '23', '34', '45', '56', '67')
       |    and c_acctbal > (
       |      select cast(sum(${sqlM("c_acctbal")}) as double) / count(*)
       |      from customer where c_acctbal > 0.0)
       |    and not exists (select * from orders
       |                    where o_custkey = c_custkey and o_totalprice > 400000)
       |) custsale
       |group by cntrycode
       |order by cntrycode""".stripMargin)

  val queries: Seq[Q] = Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11,
    q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)
}
