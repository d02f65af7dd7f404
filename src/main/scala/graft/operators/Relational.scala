package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Money._

/** Per-operator coverage for SURVEY.md §2's inventory: each logical
  * operator, scalar function, and predicate the reference plans
  * (doradb-plan/src/lgc/op.rs:162-216, doradb-expr/src/func.rs:2-27,
  * doradb-expr/src/pred.rs:5-58) gets a small oracle-checked query.
  *
  * Dialect notes (Spark vs the DuckDB oracle) that shaped these:
  * - double→bigint CAST truncates in Spark but rounds in DuckDB → both
  *   sides use floor() first;
  * - `<=>` is `IS NOT DISTINCT FROM`; `rlike` is `regexp_matches`;
  *   `div` is `//`; bitwise `^` is `xor()` (DuckDB `^` is power);
  * - ASC sorts place NULLS FIRST in Spark but LAST in DuckDB → nullable
  *   sort keys are always explicit.
  */
object Relational {

  // ---- Setop {Union, Except, Intersect} × {All, Distinct} --------------
  // (reference: lgc/setop.rs:7-33)

  val setopUnionAll: Q = Q.df(
    "setop_union_all",
    """select n_nationkey as k from nation where n_regionkey < 2
      |union all
      |select n_nationkey as k from nation where n_nationkey < 10
      |order by k""".stripMargin) { (s, dir) =>
    val n = Tables.df(s, dir, "nation")
    n.filter(col("n_regionkey") < 2).select(col("n_nationkey").as("k"))
      .unionAll(n.filter(col("n_nationkey") < 10).select(col("n_nationkey").as("k")))
      .orderBy(col("k"))
  }

  val setopUnionDistinct: Q = Q.df(
    "setop_union_distinct",
    """select n_nationkey as k from nation where n_regionkey < 2
      |union
      |select n_nationkey as k from nation where n_nationkey < 10
      |order by k""".stripMargin) { (s, dir) =>
    val n = Tables.df(s, dir, "nation")
    n.filter(col("n_regionkey") < 2).select(col("n_nationkey").as("k"))
      .union(n.filter(col("n_nationkey") < 10).select(col("n_nationkey").as("k")))
      .distinct()
      .orderBy(col("k"))
  }

  val setopExcept: Q = Q.df(
    "setop_except",
    """select n_regionkey as k from nation where n_nationkey < 20
      |except
      |select n_regionkey as k from nation where n_nationkey < 3
      |order by k""".stripMargin) { (s, dir) =>
    val n = Tables.df(s, dir, "nation")
    n.filter(col("n_nationkey") < 20).select(col("n_regionkey").as("k"))
      .except(n.filter(col("n_nationkey") < 3).select(col("n_regionkey").as("k")))
      .orderBy(col("k"))
  }

  /** Schema-reconciling union (Spark unionByName(allowMissingColumns)
    * == DuckDB UNION ALL BY NAME): columns are matched by NAME, not
    * position, and columns absent on one side are NULL-filled — the
    * union you actually want when combining heterogeneous shards whose
    * schemas drifted (the 100 TB reality, where positional UNION
    * silently pairs wrong columns). */
  val setopUnionByName: Q = Q.df(
    "setop_union_by_name",
    """select * from (
      |  select n_nationkey as k, n_name as name from nation
      |  union all by name
      |  select r_regionkey + 100 as k, r_name as rname from region)
      |order by k""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "nation")
      .select(col("n_nationkey").as("k"), col("n_name").as("name"))
      .unionByName(
        Tables.df(s, dir, "region")
          .select((col("r_regionkey") + 100).as("k"),
            col("r_name").as("rname")),
        allowMissingColumns = true)
      .orderBy(col("k"))
  }

  val setopExceptAll: Q = Q.df(
    "setop_except_all",
    """select n_regionkey as k from nation where n_nationkey < 20
      |except all
      |select n_regionkey as k from nation where n_nationkey < 3
      |order by k""".stripMargin) { (s, dir) =>
    val n = Tables.df(s, dir, "nation")
    n.filter(col("n_nationkey") < 20).select(col("n_regionkey").as("k"))
      .exceptAll(n.filter(col("n_nationkey") < 3).select(col("n_regionkey").as("k")))
      .orderBy(col("k"))
  }

  val setopIntersect: Q = Q.df(
    "setop_intersect",
    """select n_regionkey as k from nation where n_nationkey < 20
      |intersect
      |select n_regionkey as k from nation where n_nationkey >= 3
      |order by k""".stripMargin) { (s, dir) =>
    val n = Tables.df(s, dir, "nation")
    n.filter(col("n_nationkey") < 20).select(col("n_regionkey").as("k"))
      .intersect(n.filter(col("n_nationkey") >= 3).select(col("n_regionkey").as("k")))
      .orderBy(col("k"))
  }

  val setopIntersectAll: Q = Q.df(
    "setop_intersect_all",
    """select n_regionkey as k from nation where n_nationkey < 20
      |intersect all
      |select n_regionkey as k from nation where n_nationkey >= 3
      |order by k""".stripMargin) { (s, dir) =>
    val n = Tables.df(s, dir, "nation")
    n.filter(col("n_nationkey") < 20).select(col("n_regionkey").as("k"))
      .intersectAll(n.filter(col("n_nationkey") >= 3).select(col("n_regionkey").as("k")))
      .orderBy(col("k"))
  }

  // ---- Join kinds (reference: join/mod.rs:14-24) ------------------------

  val joinFullOuter: Q = Q.df(
    "join_full_outer",
    s"""select c_custkey, o_custkey, total
       |from (select c_custkey from customer where c_custkey < 100) c
       |full outer join (
       |  select o_custkey, cast(sum(${sqlM("o_totalprice")}) as double) as total
       |  from orders where o_custkey between 50 and 150 group by o_custkey) o
       |on c_custkey = o_custkey
       |order by c_custkey asc nulls first, o_custkey asc nulls first""".stripMargin) { (s, dir) =>
    val c = Tables.df(s, dir, "customer").filter(col("c_custkey") < 100)
      .select(col("c_custkey"))
    val o = Tables.df(s, dir, "orders").filter(col("o_custkey").between(50, 150))
      .groupBy(col("o_custkey")).agg(dsum(m(col("o_totalprice"))).as("total"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .orderBy(col("c_custkey").asc_nulls_first, col("o_custkey").asc_nulls_first)
  }

  val joinCross: Q = Q.df(
    "join_cross",
    """select r_name, seg from region
      |cross join (select distinct c_mktsegment as seg from customer) s
      |order by r_name, seg""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "region")
      .crossJoin(Tables.df(s, dir, "customer")
        .select(col("c_mktsegment").as("seg")).distinct())
      .select(col("r_name"), col("seg"))
      .orderBy(col("r_name"), col("seg"))
  }

  val joinSemi: Q = Q.df(
    "join_semi",
    """select c_custkey, c_name from customer
      |where exists (select * from orders
      |              where o_custkey = c_custkey and o_orderstatus = 'P')
      |order by c_custkey""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "customer")
      .join(Tables.df(s, dir, "orders").filter(col("o_orderstatus") === "P"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val joinAnti: Q = Q.df(
    "join_anti",
    """select c_custkey, c_name from customer
      |where not exists (select * from orders
      |                  where o_custkey = c_custkey and o_orderstatus = 'P')
      |order by c_custkey""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "customer")
      .join(Tables.df(s, dir, "orders").filter(col("o_orderstatus") === "P"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** USING/NATURAL joins normalize to equi-conds at build in the reference
    * (lgc/builder.rs:686-848); same here via a renamed join column. */
  val joinUsing: Q = Q.df(
    "join_using",
    """select n_name, r_name from nation
      |join (select r_regionkey as n_regionkey, r_name from region) r
      |using (n_regionkey)
      |order by n_name""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "nation")
      .join(Tables.df(s, dir, "region")
          .withColumnRenamed("r_regionkey", "n_regionkey"),
        Seq("n_regionkey"))
      .select(col("n_name"), col("r_name"))
      .orderBy(col("n_name"))
  }

  /** Explicit RIGHT JOIN — the reference's builder normalizes RIGHT to a
    * flipped LEFT at build time (lgc/builder.rs:686-848); Spark plans it
    * directly. Nations without suppliers surface with NULL supplier
    * columns (nullable sort keys are explicit per the dialect notes). */
  val joinRight: Q = Q.shared(
    "join_right",
    """select s_suppkey, s_name, n_nationkey, n_name
      |from supplier right join nation on s_nationkey = n_nationkey
      |order by n_nationkey, s_suppkey asc nulls first""".stripMargin)

  /** NATURAL JOIN — normalized to equi-conds on the shared column names
    * (lgc/builder.rs:686-848). TPC-H columns are prefix-named, so the
    * shared key is exposed via aliased derived tables. */
  val joinNatural: Q = Q.shared(
    "join_natural",
    """select nationkey, n_name, s_name
      |from (select n_nationkey as nationkey, n_name from nation) n
      |natural join (select s_nationkey as nationkey, s_name from supplier) s
      |order by nationkey, s_name""".stripMargin)

  /** First-row-per-group (`DISTINCT ON` semantics): latest order per
    * customer with a deterministic key tiebreak. DuckDB spells it with
    * native DISTINCT ON; Spark has no DISTINCT ON, so the engine side is
    * the canonical row_number()=1 window — one hash-partitioned shuffle
    * on the group key, each group reduced inside its partition (with
    * AQE handling a skewed customer). The two spellings are required to
    * agree row-for-row, which is exactly the parity a MySQL/DuckDB user
    * migrating to the engine needs pinned. */
  val distinctOn: Q = Q.df(
    "distinct_on_latest",
    """select o_custkey, o_orderkey, o_orderdate from (
      |  select distinct on (o_custkey) o_custkey, o_orderkey, o_orderdate
      |  from orders
      |  order by o_custkey, o_orderdate desc, o_orderkey desc) t
      |order by o_custkey""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .orderBy(col("o_custkey"))
  }

  /** EXISTS under a disjunction — the exact shape the reference's Mark
    * join kind exists for (join/mod.rs:20-22): the subquery result must
    * surface as a boolean column (Catalyst ExistenceJoin, plan-spec'd)
    * because it cannot decay to a plain semi join. */
  val predExistsDisjunction: Q = Q.shared(
    "pred_exists_disjunction",
    """select c_custkey, c_acctbal from customer
      |where c_acctbal > 9000
      |   or exists (select 1 from orders
      |              where o_custkey = c_custkey and o_totalprice > 400000)
      |order by c_custkey""".stripMargin)

  /** Cost-based join reorder (reference: doradb-plan/src/join/reorder/
    * {greedy,dpsize,dphyp}.rs) — the SQL lists tables in a deliberately
    * bad order (two fact tables first, the selective region filter
    * last); with CBO + ANALYZE stats (Tables.registerStats) Catalyst's
    * CostBasedJoinReorder rewrites the join tree by cardinality, which
    * PlanSpec asserts. The oracle runs the same SQL on the plain views —
    * join order never changes the result. */
  /** The deliberately badly-ordered 6-table join text, parameterized by
    * catalog prefix ("" for the DuckDB oracle / plain views,
    * "tpch_cbo." for the stats-bearing catalog tables). Public so the
    * plan spec can assert the reorder fires on the same text. */
  def joinReorderSql(prefix: String): String =
    s"""select n_name, count(*) as cnt,
         |  cast(sum(${sqlDiscPrice("l_extendedprice", "l_discount")}) as double) as revenue
         |from ${prefix}lineitem
         |join ${prefix}orders on l_orderkey = o_orderkey
         |join ${prefix}customer on o_custkey = c_custkey
         |join ${prefix}supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
         |join ${prefix}nation on s_nationkey = n_nationkey
         |join ${prefix}region on n_regionkey = r_regionkey
         |where r_name = 'ASIA'
         |  and o_orderdate >= date '1994-01-01' and o_orderdate < date '1995-01-01'
         |group by n_name
       |order by n_name""".stripMargin

  val joinReorderCbo: Q =
    Q.df("join_reorder_cbo", joinReorderSql("")) { (s, dir) =>
      Tables.registerStats(s, dir)
      s.sql(joinReorderSql(s"${Tables.StatsDb}."))
    }

  /** A 13-relation join graph — beyond Catalyst's DEFAULT cost-reorder
    * bound. The reference's DP join reorder handles graphs of up to 31
    * relations (doradb-plan/src/join/graph.rs:10-15, join/reorder/
    * dphyp.rs:11-33); Catalyst's CostBasedJoinReorder DP stops at
    * `spark.sql.cbo.joinReorder.dp.threshold` relations (default 12)
    * and silently degrades to left-deep heuristics above it, so
    * [[graft.Session]] raises the bound. Thirteen relations is how a
    * real snowflake looks once role-playing dimensions repeat — here
    * nation/region each appear three times (customer side, supplier
    * side, co-supplier side) around a two-fact basket join. CboPlanSpec
    * asserts the reorder actually fires at this width. */
  def joinReorderWideSql(prefix: String): String =
    s"""select cn.n_name as cust_nation, count(*) as cnt,
       |  cast(sum(cast(l2.l_quantity as bigint)) as bigint) as co_qty
       |from ${prefix}lineitem l
       |join ${prefix}orders o on l.l_orderkey = o.o_orderkey
       |join ${prefix}customer c on o.o_custkey = c.c_custkey
       |join ${prefix}nation cn on c.c_nationkey = cn.n_nationkey
       |join ${prefix}region cr on cn.n_regionkey = cr.r_regionkey
       |join ${prefix}supplier s on l.l_suppkey = s.s_suppkey
       |join ${prefix}nation sn on s.s_nationkey = sn.n_nationkey
       |join ${prefix}region sr on sn.n_regionkey = sr.r_regionkey
       |join ${prefix}part p on l.l_partkey = p.p_partkey
       |join ${prefix}lineitem l2
       |  on l2.l_partkey = p.p_partkey and l2.l_quantity > 45
       |join ${prefix}supplier s2 on l2.l_suppkey = s2.s_suppkey
       |join ${prefix}nation sn2 on s2.s_nationkey = sn2.n_nationkey
       |join ${prefix}region sr2 on sn2.n_regionkey = sr2.r_regionkey
       |where cr.r_name = 'ASIA' and sr2.r_name = 'EUROPE'
       |  and p.p_size < 25
       |group by cn.n_name
       |order by cn.n_name""".stripMargin

  val joinReorderWide: Q =
    Q.df("join_reorder_wide", joinReorderWideSql("")) { (s, dir) =>
      Tables.registerStats(s, dir)
      s.sql(joinReorderWideSql(s"${Tables.StatsDb}."))
    }

  /** A 20-relation join graph — the regime the reference's own comment
    * warns about (">20 relations will be very slow",
    * doradb-plan/src/join/graph.rs:10-15; its optimizer prints the
    * plan-time split at rule_optimize.rs:164-181). Extends the
    * 13-relation snowflake with the co-order branch: l2's order, its
    * customer chain, a third lineitem fact on that order, and its
    * supplier chain. Used for PLANNING-TIME measurement only
    * (CboPlanSpec times Catalyst's DP at this width and records the
    * split vs the heuristic path) — never executed, so the fact-fact
    * fan-out is irrelevant. */
  def joinReorderHugeSql(prefix: String): String =
    s"""select cn.n_name as cust_nation, count(*) as cnt
       |from ${prefix}lineitem l
       |join ${prefix}orders o on l.l_orderkey = o.o_orderkey
       |join ${prefix}customer c on o.o_custkey = c.c_custkey
       |join ${prefix}nation cn on c.c_nationkey = cn.n_nationkey
       |join ${prefix}region cr on cn.n_regionkey = cr.r_regionkey
       |join ${prefix}supplier s on l.l_suppkey = s.s_suppkey
       |join ${prefix}nation sn on s.s_nationkey = sn.n_nationkey
       |join ${prefix}region sr on sn.n_regionkey = sr.r_regionkey
       |join ${prefix}part p on l.l_partkey = p.p_partkey
       |join ${prefix}lineitem l2
       |  on l2.l_partkey = p.p_partkey and l2.l_quantity > 45
       |join ${prefix}supplier s2 on l2.l_suppkey = s2.s_suppkey
       |join ${prefix}nation sn2 on s2.s_nationkey = sn2.n_nationkey
       |join ${prefix}region sr2 on sn2.n_regionkey = sr2.r_regionkey
       |join ${prefix}orders o2 on l2.l_orderkey = o2.o_orderkey
       |join ${prefix}customer c2 on o2.o_custkey = c2.c_custkey
       |join ${prefix}nation cn3 on c2.c_nationkey = cn3.n_nationkey
       |join ${prefix}region cr3 on cn3.n_regionkey = cr3.r_regionkey
       |join ${prefix}lineitem l3
       |  on l3.l_orderkey = o2.o_orderkey and l3.l_linenumber = 1
       |join ${prefix}supplier s3 on l3.l_suppkey = s3.s_suppkey
       |join ${prefix}nation sn4 on s3.s_nationkey = sn4.n_nationkey
       |where cr.r_name = 'ASIA' and sr2.r_name = 'EUROPE'
       |  and p.p_size < 25
       |group by cn.n_name
       |order by cn.n_name""".stripMargin

  // ---- Distinct / Sort / Limit / Offset / top-k -------------------------

  val distinctRows: Q = Q.df(
    "distinct_rows",
    """select distinct o_orderstatus, o_orderpriority from orders
      |order by o_orderstatus, o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority")).distinct()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val sortLimitOffset: Q = Q.df(
    "sort_limit_offset",
    """select o_orderkey, o_totalprice from orders
      |order by o_totalprice desc, o_orderkey
      |limit 10 offset 5""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(5).limit(10)
  }

  /** Sort.limit fusion (lgc/op.rs:186-190) → Spark TakeOrderedAndProject. */
  val topK: Q = Q.df(
    "topk_orders",
    """select o_orderkey, o_totalprice from orders
      |order by o_totalprice desc, o_orderkey
      |limit 25""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  // ---- Row op: SELECT without FROM (lgc/op.rs:201-202) ------------------

  val rowConstant: Q = Q.shared(
    "row_constant",
    "select 1 as one, 'graft' as name, cast(2.5 as double) as x")

  /** Inline VALUES table (row constructors as a FROM source). */
  val rowValuesList: Q = Q.shared(
    "row_values_list",
    """select k, v from (values (1, 'a'), (2, 'b'), (3, 'c')) t(k, v)
      |order by k""".stripMargin)

  /** LATERAL correlated derived table: top-2 nations per region — the
    * per-row subquery join (Catalyst LateralJoin + decorrelation). */
  val joinLateral: Q = Q.shared(
    "join_lateral",
    """select r_name, n_name
      |from region r,
      |lateral (select n_name from nation
      |         where n_regionkey = r_regionkey
      |         order by n_name limit 2) t
      |order by r_name, n_name""".stripMargin)

  /** ANSI FILTER clause on aggregates (per-aggregate predicates without
    * CASE gymnastics). */
  val aggFilterClause: Q = Q.shared(
    "agg_filter_clause",
    """select o_orderstatus,
      |  count(*) filter (where o_totalprice > 200000) as big_cnt,
      |  count(*) filter (where o_orderpriority = '1-URGENT') as urgent_cnt,
      |  count(*) as cnt
      |from orders group by o_orderstatus
      |order by o_orderstatus""".stripMargin)

  /** Date function breadth beyond EXTRACT/interval: day arithmetic,
    * diffs, month-end (dialects spell them differently → split SQL). */
  val exprDateFuncs: Q = Q.df(
    "expr_date_funcs",
    """select o_orderkey,
      |  cast(o_orderdate as date) + 30 as plus_30d,
      |  cast(date_diff('day', date '1995-01-01', cast(o_orderdate as date)) as bigint) as days_since,
      |  last_day(cast(o_orderdate as date)) as month_end
      |from orders order by o_orderkey limit 400""".stripMargin) { (s, dir) =>
    val d = col("o_orderdate").cast("date")
    Tables.df(s, dir, "orders")
      .select(col("o_orderkey"),
        date_add(d, 30).as("plus_30d"),
        datediff(d, lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        last_day(d).as("month_end"))
      .orderBy(col("o_orderkey")).limit(400)
  }

  // ---- Aggr extras: HAVING, DISTINCT aggregates -------------------------

  val havingFilter: Q = Q.df(
    "having_count",
    """select o_custkey, count(*) as cnt from orders
      |group by o_custkey having count(*) > 15
      |order by o_custkey""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 15)
      .orderBy(col("o_custkey"))
  }

  val aggDistinct: Q = Q.df(
    "agg_distinct",
    s"""select l_returnflag,
       |  count(distinct l_suppkey) as distinct_supp,
       |  cast(sum(distinct ${sqlM("l_quantity")}) as double) as sum_dist_qty,
       |  cast(count(*) as bigint) as cnt
       |from lineitem group by l_returnflag
       |order by l_returnflag""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("distinct_supp"),
        sum_distinct(m(col("l_quantity"))).cast("double").as("sum_dist_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  // ---- Subqueries: scalar Attach, quantified ALL/ANY --------------------

  /** Non-correlated scalar subquery = the reference's Attach op
    * (lgc/op.rs:197-200). */
  val subqScalar: Q = Q.shared(
    "subq_scalar_attach",
    s"""select o_orderkey, o_totalprice from orders
       |where o_totalprice > 1.5 * (
       |  select cast(sum(${sqlM("o_totalprice")}) as double) / count(*) from orders)
       |order by o_orderkey""".stripMargin)

  /** Quantified `> ALL (subquery)` — Spark lacks ALL/ANY, so the engine
    * rewrites to a NOT EXISTS anti-join, which is equivalent under FULL
    * standard semantics (a MAX-scalar rewrite is not: ALL is vacuously
    * TRUE over an empty subquery where max yields NULL, and a NULL in
    * the subquery — or a NULL lhs with a non-empty subquery — makes ALL
    * unknown while max would ignore it). Keep the row iff no subquery
    * row fails-or-unknowns the compare; the oracle runs real ALL. */
  val subqGtAll: Q = Q.df(
    "subq_quantified_all",
    """select s_suppkey, s_name, s_acctbal from supplier
      |where s_acctbal > all (select c_acctbal from customer where c_nationkey = 1 and c_custkey < 300)
      |order by s_suppkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql("""select s_suppkey, s_name, s_acctbal from supplier
            |where not exists (
            |  select 1 from customer where c_nationkey = 1 and c_custkey < 300
            |    and (c_acctbal >= s_acctbal or c_acctbal is null or s_acctbal is null))
            |order by s_suppkey""".stripMargin)
  }

  /** Quantified `< ANY (subquery)` → EXISTS with the compare inside:
    * exact ANY semantics (FALSE over empty set, unknown compares never
    * match), unlike a MAX-scalar rewrite. */
  val subqLtAny: Q = Q.df(
    "subq_quantified_any",
    """select s_suppkey, s_name, s_acctbal from supplier
      |where s_acctbal < any (select c_acctbal from customer where c_nationkey = 2)
      |order by s_suppkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql("""select s_suppkey, s_name, s_acctbal from supplier
            |where exists (
            |  select 1 from customer where c_nationkey = 2
            |    and s_acctbal < c_acctbal)
            |order by s_suppkey""".stripMargin)
  }

  /** Correlated scalar subquery in the SELECT list — the reference's
    * Single join kind (join/mod.rs:14-24): the subquery's one value (or
    * NULL on empty) attaches to every outer row, planned by Catalyst as
    * a left-outer aggregate join. Explicit entry so the Single kind has
    * its own coverage beyond q2/q17's WHERE-side forms. */
  val subqSingleJoin: Q = Q.shared(
    "subq_single_join",
    s"""select c_custkey,
       |  (select cast(max(${sqlM("o_totalprice")}) as double) from orders
       |   where o_custkey = c_custkey) as max_price
       |from customer
       |where c_custkey < 500
       |order by c_custkey""".stripMargin)

  /** Correlated IN subquery (SubqKind::In — doradb-expr/src/expr.rs:547). */
  val subqInCorrelated: Q = Q.shared(
    "subq_in_correlated",
    """select o_orderkey, o_custkey from orders o
      |where o_orderkey in (
      |  select l_orderkey from lineitem
      |  where l_orderkey = o.o_orderkey and l_quantity > 49)
      |order by o_orderkey""".stripMargin)

  // ---- CTE, multi-referenced (CTE-as-macro, lgc/query.rs:188-228) -------

  val cteMultiRef: Q = Q.shared(
    "cte_multi_ref",
    s"""with big as (
       |  select o_custkey, count(*) as n_big from orders
       |  where o_totalprice > 200000 group by o_custkey)
       |select a.o_custkey, a.n_big,
       |  (select count(*) from big) as total_big_customers
       |from big a
       |where a.n_big > (select cast(sum(n_big) as double) / count(*) from big)
       |order by a.o_custkey""".stripMargin)

  /** Recursive CTE — the reference PARSES `WITH RECURSIVE` but rejects
    * it at build (lgc/builder.rs:272-274); Spark 4 executes it, so this
    * engine exceeds the reference here. Joined against a real table so
    * the entry exercises recursion feeding a normal join. */
  val cteRecursive: Q = Q.shared(
    "cte_recursive",
    """with recursive t(n) as (
      |  select 1
      |  union all
      |  select n + 1 from t where n < 100)
      |select t.n, r.r_name from t
      |join region r on t.n % 5 = r.r_regionkey
      |order by t.n""".stripMargin)

  // ---- Expressions: CASE, CAST, EXTRACT, SUBSTRING, arithmetic ---------

  val exprCase: Q = Q.shared(
    "expr_case_forms",
    """select o_orderkey,
      |  case o_orderstatus when 'F' then 'finished' when 'O' then 'open'
      |       else 'other' end as status_word,
      |  case when o_totalprice > 300000 then 'big'
      |       when o_totalprice > 100000 then 'mid' else 'small' end as size_class
      |from orders order by o_orderkey limit 500""".stripMargin)

  val exprCast: Q = Q.df(
    "expr_cast",
    """select o_orderkey,
      |  cast(floor(o_totalprice) as bigint) as price_floor,
      |  cast(o_orderkey as varchar) as key_str,
      |  cast(o_orderdate as date) as odate
      |from orders order by o_orderkey limit 300""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .select(
        col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_orderdate").cast("date").as("odate"))
      .orderBy(col("o_orderkey")).limit(300)
  }

  /** Extract: all units the reference parses (ast.rs:251-296) that both
    * engines agree on bit-for-bit. */
  val exprExtract: Q = Q.df(
    "expr_extract_units",
    """select event_id,
      |  cast(extract(year from ts) as bigint) as y,
      |  cast(extract(quarter from ts) as bigint) as q,
      |  cast(extract(month from ts) as bigint) as mo,
      |  cast(extract(week from ts) as bigint) as wk,
      |  cast(extract(doy from ts) as bigint) as doy,
      |  cast(extract(day from ts) as bigint) as d,
      |  cast(extract(hour from ts) as bigint) as h,
      |  cast(extract(minute from ts) as bigint) as mi,
      |  cast(floor(extract(second from ts)) as bigint) as sec
      |from events order by event_id limit 1000""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "events")
      .select(
        col("event_id"),
        year(col("ts")).cast("long").as("y"),
        quarter(col("ts")).cast("long").as("q"),
        month(col("ts")).cast("long").as("mo"),
        weekofyear(col("ts")).cast("long").as("wk"),
        dayofyear(col("ts")).cast("long").as("doy"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("sec"))
      .orderBy(col("event_id")).limit(1000)
  }

  val exprString: Q = Q.shared(
    "expr_string_funcs",
    """select p_partkey,
      |  upper(p_name) as uname, lower(p_brand) as lbrand,
      |  substring(p_name, 1, 5) as pfx,
      |  cast(length(p_name) as bigint) as len,
      |  concat(p_brand, ':', p_type) as bt
      |from part order by p_partkey limit 300""".stripMargin)

  /** Arithmetic incl. IntDiv and the bit ops (func.rs:2-27). DuckDB
    * spells them differently, so the oracle diverges syntactically. */
  val exprArith: Q = Q.df(
    "expr_arith_bits",
    """select n_nationkey,
      |  cast(n_nationkey + 7 as bigint) as add7,
      |  cast(n_nationkey - 3 as bigint) as sub3,
      |  cast(n_nationkey * 2 as bigint) as mul2,
      |  cast(n_nationkey as double) / 4.0 as div4,
      |  cast(n_nationkey // 4 as bigint) as idiv4,
      |  cast(n_nationkey % 5 as bigint) as mod5,
      |  cast(-n_nationkey as bigint) as neg,
      |  cast(n_nationkey & 6 as bigint) as band,
      |  cast(n_nationkey | 9 as bigint) as bor,
      |  cast(xor(n_nationkey, 5) as bigint) as bxor,
      |  cast(~n_nationkey as bigint) as binv,
      |  cast(n_nationkey << 2 as bigint) as shl,
      |  cast(n_nationkey >> 1 as bigint) as shr
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey")
    Tables.df(s, dir, "nation")
      .select(
        k,
        (k + 7).cast("long").as("add7"),
        (k - 3).cast("long").as("sub3"),
        (k * 2).cast("long").as("mul2"),
        (k.cast("double") / 4.0).as("div4"),
        expr("n_nationkey div 4").cast("long").as("idiv4"),
        (k % 5).cast("long").as("mod5"),
        (-k).cast("long").as("neg"),
        k.bitwiseAND(6).cast("long").as("band"),
        k.bitwiseOR(9).cast("long").as("bor"),
        k.bitwiseXOR(5).cast("long").as("bxor"),
        bitwise_not(k).cast("long").as("binv"),
        shiftleft(k, 2).cast("long").as("shl"),
        shiftright(k, 1).cast("long").as("shr"))
      .orderBy(k)
  }

  /** Math-function breadth beyond the reference's FuncKind arithmetic
    * (func.rs:2-27 stops at IntDiv/bit ops). Every column is integer-
    * exact or IEEE-exact cross-engine: sqrt is correctly rounded by
    * IEEE 754; log2 is rounded to 6 decimals because the JVM and
    * DuckDB differ in the last ulp on non-power-of-two args; both
    * engines round halves away from zero at scale 0 (Spark HALF_UP ==
    * DuckDB half-away on both signs). pmod has no DuckDB builtin →
    * ((x % m) + m) % m. */
  val exprMath: Q = Q.df(
    "expr_math_funcs",
    """select n_nationkey,
      |  cast(abs(n_nationkey - 12) as bigint) as abs_c,
      |  cast(sign(n_nationkey - 12) as bigint) as sign_c,
      |  cast(greatest(n_nationkey, n_regionkey * 5) as bigint) as greatest_c,
      |  cast(least(n_nationkey, n_regionkey * 5) as bigint) as least_c,
      |  cast(pow(n_nationkey, 2) as bigint) as pow2,
      |  sqrt(cast(n_nationkey as double)) as sqrt_d,
      |  cast(floor(n_nationkey / 4.0) as bigint) as floor_q,
      |  cast(ceil(n_nationkey / 4.0) as bigint) as ceil_q,
      |  cast(round(n_nationkey / 2.0) as bigint) as round_half,
      |  cast(round((n_nationkey - 12) / 2.0) as bigint) as round_neg,
      |  cast(factorial(n_nationkey % 10) as bigint) as fact_m10,
      |  round(log2(n_nationkey + 1), 6) as log2_k1,
      |  cast(((n_nationkey - 12) % 7 + 7) % 7 as bigint) as pmod7,
      |  cast((n_nationkey - 12) % 5 as bigint) as mod_neg,
      |  cast(bit_count(n_nationkey) as bigint) as pop_k
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey"); val r = col("n_regionkey")
    Tables.df(s, dir, "nation")
      .select(
        k,
        abs(k - 12).cast("long").as("abs_c"),
        signum(k - 12).cast("long").as("sign_c"),
        greatest(k, r * 5).cast("long").as("greatest_c"),
        least(k, r * 5).cast("long").as("least_c"),
        pow(k, 2).cast("long").as("pow2"),
        sqrt(k.cast("double")).as("sqrt_d"),
        floor(k / 4.0).cast("long").as("floor_q"),
        ceil(k / 4.0).cast("long").as("ceil_q"),
        round(k / 2.0).cast("long").as("round_half"),
        round((k - 12) / 2.0).cast("long").as("round_neg"),
        factorial(k % 10).cast("long").as("fact_m10"),
        round(log2(k + 1), 6).as("log2_k1"),
        pmod(k - 12, lit(7)).cast("long").as("pmod7"),
        ((k - 12) % 5).cast("long").as("mod_neg"),
        bit_count(k).cast("long").as("pop_k"))
      .orderBy(k)
  }

  /** Null-handling function family (the reference's const-folding layer
    * models NULL propagation but has no IFNULL/NVL2 builtins —
    * doradb-expr/src/func.rs:2-27). COALESCE/IFNULL/NULLIF exist in both
    * engines; NVL2 is Spark-only, so the oracle spells it as the
    * equivalent searched CASE. */
  val exprNullFuncs: Q = Q.df(
    "expr_null_funcs",
    """select n_nationkey,
      |  cast(coalesce(nullif(n_regionkey, 2), nullif(n_nationkey % 3, 2), 99)
      |    as bigint) as coal,
      |  cast(ifnull(nullif(n_regionkey, 0), -1) as bigint) as ifn,
      |  cast(case when nullif(n_regionkey, 2) is not null
      |       then n_nationkey else -n_nationkey end as bigint) as nvl2_c,
      |  case when n_nationkey % 2 = 0 then 'even' else 'odd' end as par,
      |  cast(nullif(n_regionkey, n_nationkey % 5) as bigint) as nif
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey")
    Tables.df(s, dir, "nation")
      .select(
        k,
        expr("cast(coalesce(nullif(n_regionkey, 2), nullif(n_nationkey % 3, 2), 99) as bigint)").as("coal"),
        expr("cast(ifnull(nullif(n_regionkey, 0), -1) as bigint)").as("ifn"),
        expr("cast(nvl2(nullif(n_regionkey, 2), n_nationkey, -n_nationkey) as bigint)").as("nvl2_c"),
        when(k % 2 === 0, "even").otherwise("odd").as("par"),
        expr("cast(nullif(n_regionkey, n_nationkey % 5) as bigint)").as("nif"))
      .orderBy(k)
  }

  /** Calendar arithmetic beyond Extract: month stepping with end-of-month
    * clamping (add_months == DuckDB's +INTERVAL, both clamp Jan 31 + 1mo
    * to Feb 28), weekday (Spark Monday=0 == DuckDB isodow-1), locale day
    * names, date construction, and epoch-day conversion — all
    * timezone-free so the pin is exact cross-engine. */
  val exprDateFuncs2: Q = Q.df(
    "expr_date_funcs2",
    """select o_orderkey,
      |  cast(cast(o_orderdate as date) + interval 1 month as date) as am1,
      |  cast(cast(o_orderdate as date) - interval 2 month as date) as am_neg,
      |  cast(isodow(cast(o_orderdate as date)) - 1 as bigint) as wd,
      |  dayname(cast(o_orderdate as date)) as dname,
      |  make_date(year(cast(o_orderdate as date)),
      |            month(cast(o_orderdate as date)), 1) as month_start,
      |  cast(date_diff('day', date '1970-01-01', cast(o_orderdate as date))
      |    as bigint) as epoch_days,
      |  cast(o_orderdate as date) - 15 as minus_15
      |from orders order by o_orderkey limit 400""".stripMargin) { (s, dir) =>
    val d = col("o_orderdate").cast("date")
    Tables.df(s, dir, "orders")
      .select(col("o_orderkey"),
        add_months(d, 1).as("am1"),
        add_months(d, -2).as("am_neg"),
        weekday(d).cast("long").as("wd"),
        date_format(d, "EEEE").as("dname"),
        make_date(year(d), month(d), lit(1)).as("month_start"),
        unix_date(d).cast("long").as("epoch_days"),
        date_sub(d, 15).as("minus_15"))
      .orderBy(col("o_orderkey")).limit(400)
  }

  /** Transcendental function surface: trig, exp/log family, cbrt,
    * degree/radian conversion. Same text executes in both engines;
    * every column is rounded to 6 decimals because libm implementations
    * may differ in the last ulp (same policy as log2 in [[exprMath]]).
    * Dialect trap this entry pins: a bare literal like `7.0` is
    * DECIMAL(2,1) in Spark but DOUBLE in DuckDB, so `k / 7.0` silently
    * becomes scale-6 decimal division in Spark and tan() sees an input
    * off by up to 5e-7 — all arithmetic therefore goes through an
    * explicit double `x`. Inputs are bounded (exp arg <= 2.4, tan arg
    * <= 3.43 rad) so absolute 1e-6 precision is meaningful everywhere. */
  val exprMathTrig: Q = Q.shared(
    "expr_math_trig",
    """with b as (select n_nationkey, cast(n_nationkey as double) as x
      |  from nation)
      |select n_nationkey,
      |  round(sin(x), 6) as sin_c,
      |  round(cos(x), 6) as cos_c,
      |  round(tan(x / 7), 6) as tan_c,
      |  round(atan2(x, x + 1), 6) as atan2_c,
      |  round(exp(x / 10), 6) as exp_c,
      |  round(ln(x + 1), 6) as ln_c,
      |  round(log10(x + 1), 6) as log10_c,
      |  round(cbrt(x), 6) as cbrt_c,
      |  round(degrees(x / 10), 6) as deg_c,
      |  round(radians(x), 6) as rad_c
      |from b order by n_nationkey""".stripMargin)

  /** Array set algebra (distinct/intersect/except/overlap) plus
    * positional ops (position/contains/slice/flatten) — the non-lambda
    * complement of [[exprHigherOrder]]. Set-op outputs are sorted before
    * joining to a string because Spark preserves first-occurrence order
    * while DuckDB's list_distinct order is unspecified; DuckDB empty-list
    * array_to_string is NULL (Spark's array_join is ''), hence the
    * COALESCEs. k=5 and k=20 produce a genuinely empty intersect/slice,
    * exercising that branch. */
  val exprArraySetops: Q = Q.df(
    "expr_array_setops",
    """with b as (select n_nationkey as k,
      |    range(1, 2 + n_nationkey % 5) as xs,
      |    range(n_nationkey % 3, 4 + n_nationkey % 3) as ys
      |  from nation)
      |select k,
      |  array_to_string(list_sort(list_distinct(list_concat(xs, ys))), ',') as dis,
      |  coalesce(array_to_string(list_sort(list_intersect(xs, ys)), ','), '') as inter,
      |  coalesce(array_to_string(list_sort(
      |    list_filter(xs, x -> not list_contains(ys, x))), ','), '') as exc,
      |  list_has_any(xs, ys) as overl,
      |  cast(list_position(xs, 2) as bigint) as pos2,
      |  list_contains(xs, 3) as has3,
      |  coalesce(array_to_string(xs[2:3], ','), '') as sl,
      |  array_to_string(flatten([xs, ys]), ',') as flat
      |from b order by k""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey")
    Tables.df(s, dir, "nation")
      .select(k.as("k"),
        sequence(lit(1), lit(1) + k % 5).as("xs"),
        sequence(k % 3, k % 3 + 3).as("ys"))
      .select(col("k"),
        array_join(sort_array(array_distinct(concat(col("xs"), col("ys"))))
          .cast("array<string>"), ",").as("dis"),
        array_join(sort_array(array_intersect(col("xs"), col("ys")))
          .cast("array<string>"), ",").as("inter"),
        array_join(sort_array(array_except(col("xs"), col("ys")))
          .cast("array<string>"), ",").as("exc"),
        arrays_overlap(col("xs"), col("ys")).as("overl"),
        array_position(col("xs"), 2).cast("long").as("pos2"),
        array_contains(col("xs"), 3).as("has3"),
        array_join(slice(col("xs"), 2, 2).cast("array<string>"), ",").as("sl"),
        array_join(flatten(array(col("xs"), col("ys")))
          .cast("array<string>"), ",").as("flat"))
      .orderBy(col("k"))
  }

  /** Digest and encoding functions: md5 / sha-256 hex digests, integer
    * hex/binary rendering, ascii/chr, and base64 (Spark base64 over a
    * binary cast == DuckDB to_base64 over encode; no MIME line breaks at
    * these lengths). Both engines emit lowercase digests and uppercase
    * integer hex. */
  val exprHashEncode: Q = Q.df(
    "expr_hash_encode",
    """select p_partkey,
      |  md5(p_name) as m5,
      |  sha256(p_name) as s256,
      |  to_hex(p_partkey) as hx,
      |  bin(p_partkey % 64) as bn,
      |  cast(ascii(substring(p_name, 1, 1)) as bigint) as asc1,
      |  chr(cast(65 + p_partkey % 26 as int)) as ch,
      |  to_base64(encode(p_name)) as b64
      |from part order by p_partkey limit 300""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "part")
      .select(col("p_partkey"),
        md5(col("p_name")).as("m5"),
        sha2(col("p_name"), 256).as("s256"),
        hex(col("p_partkey")).as("hx"),
        bin(col("p_partkey") % 64).as("bn"),
        ascii(substring(col("p_name"), 1, 1)).cast("long").as("asc1"),
        expr("chr(65 + p_partkey % 26)").as("ch"),
        base64(col("p_name").cast("binary")).as("b64"))
      .orderBy(col("p_partkey")).limit(300)
  }

  /** Error-suppressing TRY arithmetic (try_add/subtract/multiply/divide/
    * mod): NULL instead of overflow or division-by-zero. DuckDB's plain
    * operators already yield NULL on x/0 and mod(x,0), so those oracle
    * directly; int64 overflow ERRORS in DuckDB, so the overflow columns
    * oracle as the expected CASE/NULL values (that IS the expected
    * output, spelled without tripping the error). */
  val exprTryArith: Q = Q.df(
    "expr_try_arith",
    """select n_nationkey,
      |  round(cast(n_nationkey as double) / (n_nationkey % 3), 6) as td,
      |  cast(mod(n_nationkey, n_nationkey % 3) as bigint) as tm,
      |  case when n_nationkey = 0 then 9223372036854775807
      |       else cast(null as bigint) end as ta_ovf,
      |  case when n_nationkey <= 1
      |       then 4611686018427387904 * n_nationkey
      |       else cast(null as bigint) end as tmul_ovf,
      |  case when n_nationkey = 0 then -9223372036854775808
      |       else cast(null as bigint) end as ts_ovf
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey")
    Tables.df(s, dir, "nation")
      .select(
        k,
        round(try_divide(k.cast("double"), k % 3), 6).as("td"),
        expr("cast(try_mod(n_nationkey, n_nationkey % 3) as bigint)")
          .as("tm"),
        try_add(lit(Long.MaxValue), k.cast("long")).as("ta_ovf"),
        try_multiply(lit(4611686018427387904L), k.cast("long"))
          .as("tmul_ovf"),
        try_subtract(lit(Long.MinValue), k.cast("long")).as("ts_ovf"))
      .orderBy(k)
  }

  /** Bivariate statistical aggregates: correlation, sample/population
    * covariance, least-squares regression (slope/intercept/count), exact
    * median, count_if, any_value. Inputs are the small-magnitude
    * (quantity, linenumber) pair so partition-order float noise (~1e-12)
    * sits far below the 6-decimal grid; any_value is deterministic
    * because its argument is constant per group. */
  val aggStatsRegression: Q = Q.shared(
    "agg_stats_regression",
    """select l_returnflag,
      |  round(corr(l_quantity, l_linenumber), 6) as corr_ql,
      |  round(covar_samp(l_quantity, l_linenumber), 6) as cov_s,
      |  round(covar_pop(l_quantity, l_linenumber), 6) as cov_p,
      |  round(regr_slope(l_quantity, l_linenumber), 6) as slope,
      |  round(regr_intercept(l_quantity, l_linenumber), 6) as icept,
      |  cast(regr_count(l_quantity, l_linenumber) as bigint) as n_pairs,
      |  cast(median(l_quantity) as double) as med_q,
      |  cast(count_if(l_quantity > 25) as bigint) as n_hi,
      |  any_value(upper(l_returnflag)) as av
      |from lineitem group by l_returnflag order by l_returnflag""".stripMargin)

  /** Timestamp construction and arithmetic: make_timestamp from date
    * parts + key-derived time-of-day, epoch seconds (UTC session ==
    * DuckDB's tz-free epoch), pattern formatting (Spark date_format ==
    * DuckDB strftime), H/M/S extraction, seconds-since-midnight, and
    * minute truncation. Timestamps never travel raw: DuckDB hands
    * pandas tz-aware values where Spark's are naive, so every output is
    * a string or a bigint. */
  val exprTimestampFuncs: Q = Q.df(
    "expr_timestamp_funcs",
    """with b as (select o_orderkey as k,
      |    make_timestamp(cast(year(cast(o_orderdate as date)) as int),
      |                   cast(month(cast(o_orderdate as date)) as int),
      |                   cast(day(cast(o_orderdate as date)) as int),
      |                   cast(o_orderkey % 24 as int),
      |                   cast(o_orderkey % 60 as int),
      |                   cast(o_orderkey % 60 as double)) as ts
      |  from orders)
      |select k,
      |  cast(epoch(ts) as bigint) as ep,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') as fmt,
      |  cast(hour(ts) as bigint) as hh,
      |  cast(minute(ts) as bigint) as mi,
      |  cast(second(ts) as bigint) as ss,
      |  cast(date_diff('second', date_trunc('day', ts), ts) as bigint)
      |    as since_midnight,
      |  strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') as trunc_min
      |from b order by k limit 400""".stripMargin) { (s, dir) =>
    val ts = col("ts")
    Tables.df(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        expr("""make_timestamp(year(cast(o_orderdate as date)),
          month(cast(o_orderdate as date)), day(cast(o_orderdate as date)),
          cast(o_orderkey % 24 as int), cast(o_orderkey % 60 as int),
          cast(o_orderkey % 60 as int))""").as("ts"))
      .select(col("k"),
        unix_timestamp(ts).cast("long").as("ep"),
        date_format(ts, "yyyy-MM-dd HH:mm:ss").as("fmt"),
        hour(ts).cast("long").as("hh"),
        minute(ts).cast("long").as("mi"),
        second(ts).cast("long").as("ss"),
        (unix_timestamp(ts) - unix_timestamp(date_trunc("DAY", ts)))
          .cast("long").as("since_midnight"),
        date_format(date_trunc("MINUTE", ts), "yyyy-MM-dd HH:mm:ss")
          .as("trunc_min"))
      .orderBy(col("k")).limit(400)
  }

  /** Rounding modes and bucketing: banker's rounding (Spark bround ==
    * DuckDB round_even) against half-away round on the same .5 inputs,
    * width_bucket (no DuckDB builtin → the defining arithmetic as
    * oracle), and arbitrary-base rendering (Spark conv == DuckDB
    * to_base). */
  val exprRoundModes: Q = Q.df(
    "expr_round_modes",
    """select n_nationkey,
      |  cast(round_even(cast(n_nationkey as double) + 0.5, 0) as bigint)
      |    as br_half,
      |  cast(round(cast(n_nationkey as double) + 0.5, 0) as bigint) as r_half,
      |  cast(cast(floor(n_nationkey * 5.0 / 25) as int) + 1 as bigint) as wb,
      |  to_base(n_nationkey, 16) as hx16
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey")
    Tables.df(s, dir, "nation")
      .select(k,
        bround(k.cast("double") + 0.5, 0).cast("long").as("br_half"),
        round(k.cast("double") + 0.5, 0).cast("long").as("r_half"),
        expr("width_bucket(n_nationkey, 0, 25, 5)").cast("long").as("wb"),
        conv(k, 10, 16).as("hx16"))
      .orderBy(k)
  }

  /** Calendar part 3 — the ISO-week year-boundary trap: weekofyear is
    * ISO-8601 in BOTH engines (Jan 1 can be week 52/53 of the PREVIOUS
    * ISO year, late Dec can be week 1 of the next), paired with the
    * ISO year (Spark extract(YEAROFWEEK) == DuckDB isoyear) so the
    * (year, week) pair is pinned exactly where it disagrees with the
    * calendar year. Input is restricted to Dec/Jan order dates so the
    * boundary rows dominate the compared sample. Plus last_day
    * (month-end clamp, leap-Feb included in the date range) and
    * datediff from the epoch of the dataset. */
  val exprDateFuncs3: Q = Q.df(
    "expr_date_funcs3",
    """select o_orderkey as k,
      |  cast(weekofyear(cast(o_orderdate as date)) as bigint) as iso_wk,
      |  cast(isoyear(cast(o_orderdate as date)) as bigint) as iso_yr,
      |  cast(last_day(cast(o_orderdate as date)) as varchar) as month_end,
      |  cast(date_diff('day', DATE '1992-01-01',
      |       cast(o_orderdate as date)) as bigint) as days_since
      |from orders
      |where month(cast(o_orderdate as date)) in (1, 12)
      |order by k limit 400""".stripMargin) { (s, dir) =>
    val d = col("o_orderdate").cast("date")
    Tables.df(s, dir, "orders")
      .filter(month(d).isin(1, 12))
      .select(col("o_orderkey").as("k"),
        weekofyear(d).cast("long").as("iso_wk"),
        expr("extract(yearofweek from cast(o_orderdate as date))")
          .cast("long").as("iso_yr"),
        last_day(d).cast("string").as("month_end"),
        datediff(d, lit("1992-01-01").cast("date")).cast("long")
          .as("days_since"))
      .orderBy(col("k")).limit(400)
  }

  /** Regexp beyond boolean matching ([[predRegexp]]): group extraction,
    * global replacement, match counting, first-match substring. Dialect
    * pins: DuckDB regexp_replace replaces only the FIRST match unless
    * given the 'g' flag (Spark always replaces all); Spark regexp_substr
    * returns NULL on no match where DuckDB regexp_extract returns ''
    * (hence the COALESCE); no-match group extraction is '' in both. */
  val exprRegexpFuncs: Q = Q.df(
    "expr_regexp_funcs",
    """select p_partkey,
      |  regexp_extract(p_name, '(\w+) (\w+)', 2) as word2,
      |  regexp_extract(p_name, '([0-9]+)', 1) as digits,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') as devowel,
      |  cast(len(regexp_extract_all(p_name, '[aeiou]')) as bigint) as n_vowels,
      |  coalesce(regexp_extract(p_name, '[a-z]+st[a-z]*'), '') as st_word
      |from part order by p_partkey limit 300""".stripMargin) { (s, dir) =>
    val n = col("p_name")
    Tables.df(s, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(n, "(\\w+) (\\w+)", 2).as("word2"),
        regexp_extract(n, "([0-9]+)", 1).as("digits"),
        regexp_replace(n, "[aeiou]", "_").as("devowel"),
        regexp_count(n, lit("[aeiou]")).cast("long").as("n_vowels"),
        coalesce(regexp_substr(n, lit("[a-z]+st[a-z]*")), lit(""))
          .as("st_word"))
      .orderBy(col("p_partkey")).limit(300)
  }

  /** String function breadth, part 3: multi-arg concat with separator,
    * character translation, repetition, 1-based substring position,
    * left/right prefixes, character-set trims, and C-style formatting
    * (Spark format_string == DuckDB printf). */
  val exprString3: Q = Q.df(
    "expr_string_funcs3",
    """select p_partkey,
      |  concat_ws('-', p_brand, p_type) as bc,
      |  translate(p_name, 'aeiou', 'AEIOU') as upvowel,
      |  repeat('*', cast(p_partkey % 4 as int)) as stars,
      |  cast(instr(p_name, 'o') as bigint) as pos_o,
      |  left(p_name, 4) as l4,
      |  right(p_name, 4) as r4,
      |  ltrim(concat('xx', p_brand), 'x') as lstripped,
      |  rtrim(concat(p_brand, 'xx'), 'x') as rstripped,
      |  trim(concat('yy', p_brand, 'yy'), 'y') as stripped,
      |  printf('%s/%d', p_brand, p_partkey) as fmt
      |from part order by p_partkey limit 300""".stripMargin) { (s, dir) =>
    val n = col("p_name"); val b = col("p_brand")
    Tables.df(s, dir, "part")
      .select(col("p_partkey"),
        concat_ws("-", b, col("p_type")).as("bc"),
        translate(n, "aeiou", "AEIOU").as("upvowel"),
        repeat(lit("*"), (col("p_partkey") % 4).cast("int")).as("stars"),
        instr(n, "o").cast("long").as("pos_o"),
        expr("left(p_name, 4)").as("l4"),
        expr("right(p_name, 4)").as("r4"),
        ltrim(concat(lit("xx"), b), "x").as("lstripped"),
        rtrim(concat(b, lit("xx")), "x").as("rstripped"),
        trim(concat(lit("yy"), b, lit("yy")), "y").as("stripped"),
        format_string("%s/%d", b, col("p_partkey")).as("fmt"))
      .orderBy(col("p_partkey")).limit(300)
  }

  /** Map-typed expressions: construction from key/value arrays, key and
    * value enumeration, cardinality, lookup, missing-key NULL, and
    * map_concat override. DuckDB's element_at/map[] returns a LIST (its
    * maps allow duplicate keys) so every oracle lookup scalarizes with
    * [1]; both engines preserve insertion order for map_keys/values. */
  val exprMapFuncs: Q = Q.df(
    "expr_map_funcs",
    """with b as (select n_nationkey as k,
      |    map([n_nationkey, n_nationkey + 100],
      |        [n_regionkey, n_regionkey * 2]) as m
      |  from nation)
      |select k,
      |  array_to_string(map_keys(m), ',') as mk,
      |  array_to_string(map_values(m), ',') as mv,
      |  cast(cardinality(m) as bigint) as card,
      |  cast(element_at(m, k)[1] as bigint) as hit,
      |  cast(coalesce(element_at(m, -1)[1], -99) as bigint) as miss,
      |  cast(element_at(map_concat(m, map([99], [0])), 99)[1] as bigint)
      |    as extended
      |from b order by k""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey"); val r = col("n_regionkey")
    Tables.df(s, dir, "nation")
      .select(k.as("k"),
        map_from_arrays(array(k, k + 100), array(r, r * 2)).as("m"))
      .select(col("k"),
        array_join(map_keys(col("m")).cast("array<string>"), ",").as("mk"),
        array_join(map_values(col("m")).cast("array<string>"), ",").as("mv"),
        size(col("m")).cast("long").as("card"),
        element_at(col("m"), col("k")).cast("long").as("hit"),
        coalesce(element_at(col("m"), lit(-1)), lit(-99)).cast("long")
          .as("miss"),
        element_at(map_concat(col("m"), map(lit(99), lit(0))), lit(99))
          .cast("long").as("extended"))
      .orderBy(col("k"))
  }

  /** Generator expressions: posexplode (explode with ordinality) — the
    * row-producing surface the reference has no analogue for. DuckDB
    * spells it as a lateral unnest over the index range. */
  val exprExplodePos: Q = Q.df(
    "expr_explode_pos",
    """with b as (select n_nationkey as k,
      |    range(1, 2 + n_nationkey % 3) as xs from nation)
      |select k, cast(i as bigint) as pos, cast(b.xs[i + 1] as bigint) as x
      |from b, unnest(range(0, len(b.xs))) as t(i)
      |order by k, pos""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey")
    Tables.df(s, dir, "nation")
      .select(k.as("k"), sequence(lit(1), lit(1) + k % 3).as("xs"))
      .select(col("k"), posexplode(col("xs")))
      .select(col("k"), col("pos").cast("long").as("pos"),
        col("col").cast("long").as("x"))
      .orderBy(col("k"), col("pos"))
  }

  /** OUTER explode: a row whose array is EMPTY survives with a NULL
    * element (plain explode silently drops it — the lateral-view bug
    * class every ETL hits once). Arrays here are each nation's key
    * repeated (key % 3) times, so keys ≡ 0 (mod 3) produce empty
    * arrays and the outer form provably emits them. DuckDB has no
    * unnest-outer; the oracle spells the semantics directly: pad
    * empty arrays with [NULL], then unnest. Ordering coalesces NULL
    * to '' so both engines' null placement agrees. */
  val exprExplodeOuter: Q = Q.df(
    "expr_explode_outer",
    """with b as (select n_nationkey as k,
      |    list_transform(range(0, n_nationkey % 3),
      |      i -> 'v' || cast(n_nationkey as varchar)) as xs from nation),
      |p as (select k, case when len(xs) = 0
      |        then [cast(null as varchar)] else xs end as xs from b)
      |select k, unnest(xs) as x from p
      |order by k, coalesce(x, '')""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey")
    Tables.df(s, dir, "nation")
      .select(k.as("k"),
        array_repeat(concat(lit("v"), k.cast("string")),
          (k % 3).cast("int")).as("xs"))
      .select(col("k"), explode_outer(col("xs")).as("x"))
      .orderBy(col("k"), coalesce(col("x"), lit("")))
  }

  /** Compound/nested types — the reference's PreciseType declares
    * Compound "currently not support" (doradb-datatype/src/lib.rs:60-61);
    * Spark's array/struct columns execute them natively, so this engine
    * exceeds the reference here. 1-based element_at in Spark mirrors
    * DuckDB's 1-based list indexing. */
  val exprComplexTypes: Q = Q.df(
    "expr_complex_types",
    """select n_nationkey,
      |  (list_value(n_nationkey, n_regionkey, n_nationkey + n_regionkey))[1] as first_el,
      |  (list_value(n_nationkey, n_regionkey, n_nationkey + n_regionkey))[3] as last_el,
      |  cast(len(list_value(n_nationkey, n_regionkey)) as bigint) as arr_len,
      |  struct_pack(key := n_nationkey, name := n_name).name as s_name,
      |  list_sort(list_value(n_regionkey, n_nationkey))[1] as sorted_min
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val k = col("n_nationkey"); val r = col("n_regionkey")
    val arr = array(k, r, (k + r))
    Tables.df(s, dir, "nation")
      .select(k,
        element_at(arr, 1).as("first_el"),
        element_at(arr, 3).as("last_el"),
        size(array(k, r)).cast("long").as("arr_len"),
        struct(k.as("key"), col("n_name").as("name"))
          .getField("name").as("s_name"),
        element_at(sort_array(array(r, k)), 1).as("sorted_min"))
      .orderBy(k)
  }

  /** try_cast — ANSI-mode error handling surface: malformed casts yield
    * NULL instead of failing the query (both dialects agree). */
  val exprTryCast: Q = Q.shared(
    "expr_try_cast",
    """select n_nationkey,
      |  try_cast(n_name as int) as bad_int,
      |  try_cast(cast(n_nationkey as string) as int) as good_int,
      |  try_cast('2024-02-30' as date) is null as bad_date_is_null
      |from nation order by n_nationkey""".stripMargin)

  /** Interval arithmetic + date_trunc (Interval type, datatype lib.rs:487). */
  val exprInterval: Q = Q.shared(
    "expr_interval_arith",
    """select o_orderkey,
      |  o_orderdate + interval 30 day as due_30d,
      |  o_orderdate - interval 2 month as back_2mo,
      |  cast(date_trunc('month', o_orderdate) as timestamp) as month_start
      |from orders order by o_orderkey limit 300""".stripMargin)

  // ---- Predicates (pred.rs:5-58) ----------------------------------------

  val predSurface: Q = Q.shared(
    "pred_surface",
    """select p_partkey, p_name, p_type, p_size from part
      |where p_name like 'red%' and p_name not like '%ring%'
      |  and p_type in ('ECONOMY', 'PROMO') and p_size between 10 and 40
      |  and p_retailprice is not null
      |order by p_partkey""".stripMargin)

  val predRegexp: Q = Q.df(
    "pred_regexp",
    """select p_partkey, p_name from part
      |where regexp_matches(p_name, '^(red|blue) .*(t|g)$')
      |order by p_partkey""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "part")
      .filter(col("p_name").rlike("^(red|blue) .*(t|g)$"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** `<=>` (SafeEqual, pred.rs:5-58) with genuinely NULL inputs. */
  val predNullSafeEq: Q = Q.df(
    "pred_null_safe_eq",
    """select n_nationkey,
      |  nullif(n_regionkey, 2) is not distinct from nullif(n_nationkey % 3, 2) as nse,
      |  nullif(n_regionkey, 2) is null as lhs_null
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val lhs = nullif(col("n_regionkey"), lit(2))
    val rhs = nullif(col("n_nationkey") % 3, lit(2))
    Tables.df(s, dir, "nation")
      .select(col("n_nationkey"), (lhs <=> rhs).as("nse"), lhs.isNull.as("lhs_null"))
      .orderBy(col("n_nationkey"))
  }

  /** Row-value (tuple) expressions — ExprKind::Tuple
    * (doradb-expr/src/expr.rs:39) paired with InValues/NotInValues
    * (doradb-expr/src/pred.rs:52-54): MySQL's multi-column
    * `(a,b) IN ((1,2),(3,4))` membership, plus lexicographic tuple
    * comparison and tuple equality. Spark evaluates all three through
    * `struct()` — struct equality drives `isin`, and structs are
    * orderable so `<` is the same field-by-field lexicographic compare
    * the row-value form implies; DuckDB spells it with native row-value
    * syntax. Whole-stage-codegen-friendly: no UDF, no join. */
  val predRowTuples: Q = Q.df(
    "pred_row_tuples",
    """select o_orderkey, o_orderstatus, o_orderpriority,
      |  (o_orderstatus, o_orderpriority)
      |    in (('F', '1-URGENT'), ('O', '2-HIGH')) as in_pairs,
      |  (o_orderstatus, o_orderpriority)
      |    not in (('F', '1-URGENT'), ('O', '2-HIGH')) as not_in_pairs,
      |  (o_orderstatus, o_orderpriority) < ('O', '3-MEDIUM') as lt_pair,
      |  (o_orderstatus, o_orderpriority) = ('F', '5-LOW') as eq_pair
      |from orders order by o_orderkey limit 500""".stripMargin) { (s, dir) =>
    val t = struct(col("o_orderstatus"), col("o_orderpriority"))
    val pairs = Seq(
      struct(lit("F"), lit("1-URGENT")), struct(lit("O"), lit("2-HIGH")))
    Tables.df(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        t.isin(pairs: _*).as("in_pairs"),
        (!t.isin(pairs: _*)).as("not_in_pairs"),
        (t < struct(lit("O"), lit("3-MEDIUM"))).as("lt_pair"),
        (t === struct(lit("F"), lit("5-LOW"))).as("eq_pair"))
      .orderBy(col("o_orderkey")).limit(500)
  }

  /** Row-tuple IN over a SUBQUERY — the other half of
    * ExprKind::Tuple's pairing with the reference's subquery predicates
    * (doradb-expr/src/expr.rs:39 + InSubquery): the canonical MySQL
    * `(k, d) IN (SELECT k, max(d) …)` latest-row-per-key idiom. Both
    * engines share the SQL; Catalyst rewrites the multi-column IN to a
    * two-key LEFT SEMI hash join against the aggregated subquery —
    * shuffle on the compound key, no row-by-row probe, which is exactly
    * the plan you want at scale. Dialect split: Spark binds the bare
    * multi-column `(a, b) IN (SELECT x, y …)`; DuckDB wants the
    * subquery to yield ONE row-valued column, `(SELECT (x, y) …)`. */
  val subqRowTupleIn: Q = Q.df(
    "subq_row_tuple_in",
    """select o_orderkey, o_custkey, o_orderdate from orders
      |where (o_custkey, o_orderdate) in
      |  (select (o_custkey, max(o_orderdate)) from orders
      |   group by o_custkey)
      |order by o_orderkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """select o_orderkey, o_custkey, o_orderdate from orders
        |where (o_custkey, o_orderdate) in
        |  (select o_custkey, max(o_orderdate) from orders
        |   group by o_custkey)
        |order by o_orderkey""".stripMargin)
  }

  /** Logical XOR with 3VL (Pred::Xor, pred.rs:8): boolean `<>` matches
    * MySQL XOR's null semantics — NULL if either side is NULL. */
  val predLogicalXor: Q = Q.shared(
    "pred_logical_xor",
    """select p_partkey,
      |  (p_size > 25) <> (p_retailprice > 950.0) as lxor
      |from part order by p_partkey limit 300""".stripMargin)

  /** IS TRUE / IS NOT TRUE forms (pred.rs) — engine uses `<=> true`,
    * oracle the equivalent coalesce. */
  val predIsTrue: Q = Q.df(
    "pred_is_true",
    """select n_nationkey,
      |  coalesce(nullif(n_regionkey, 2) > 1, false) as is_true,
      |  not coalesce(nullif(n_regionkey, 2) > 1, false) as is_not_true,
      |  coalesce(not (nullif(n_regionkey, 2) > 1), false) as is_false
      |from nation order by n_nationkey""".stripMargin) { (s, dir) =>
    val p = nullif(col("n_regionkey"), lit(2)) > 1
    Tables.df(s, dir, "nation")
      .select(
        col("n_nationkey"),
        (p <=> lit(true)).as("is_true"),
        (!(p <=> lit(true))).as("is_not_true"),
        (p <=> lit(false)).as("is_false"))
      .orderBy(col("n_nationkey"))
  }

  /** min_by/max_by (DuckDB arg_min/arg_max): value-at-extremum
    * aggregates; the ordering column is the unique primary key so the
    * answer is deterministic. */
  val aggMinMaxBy: Q = Q.df(
    "agg_min_max_by",
    """select n_regionkey,
      |  arg_max(n_name, n_nationkey) as last_nation,
      |  arg_min(n_name, n_nationkey) as first_nation,
      |  count(*) as cnt
      |from nation group by n_regionkey
      |order by n_regionkey""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        max_by(col("n_name"), col("n_nationkey")).as("last_nation"),
        min_by(col("n_name"), col("n_nationkey")).as("first_nation"),
        count(lit(1)).as("cnt"))
      .orderBy(col("n_regionkey"))
  }

  /** bool_and / bool_or aggregates — same spelling in both dialects. */
  val aggBool: Q = Q.shared(
    "agg_bool",
    """select o_orderstatus,
      |  bool_and(o_totalprice > 1000) as all_over_1k,
      |  bool_or(o_totalprice > 400000) as any_over_400k,
      |  count(*) as cnt
      |from orders group by o_orderstatus
      |order by o_orderstatus""".stripMargin)

  /** Ordered string aggregation: Spark 4 LISTAGG ... WITHIN GROUP vs
    * DuckDB string_agg(... ORDER BY) — same deterministic result. */
  val aggStringAgg: Q = Q.df(
    "agg_string_agg",
    """select n_regionkey,
      |  string_agg(n_name, ',' order by n_name) as names
      |from nation group by n_regionkey
      |order by n_regionkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql("""select n_regionkey,
            |  listagg(n_name, ',') within group (order by n_name) as names
            |from nation group by n_regionkey
            |order by n_regionkey""".stripMargin)
  }

  /** Most-frequent-value aggregate (mode, same spelling both dialects).
    * Tie-breaking is engine-unspecified, but l_linenumber's frequency
    * maximum per return flag is unique at every fixture scale (probed
    * 0.001/0.01/0.1: 3 max-cells for 3 groups), so the result is
    * deterministic. Distributed shape: one hash aggregate over
    * (group, value) counts — no sort, no skew hazard beyond the
    * group-by itself. */
  val aggMode: Q = Q.df(
    "agg_mode",
    """select l_returnflag,
      |  cast(mode(l_linenumber) as bigint) as mode_line,
      |  count(*) as cnt
      |from lineitem group by l_returnflag
      |order by l_returnflag""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(mode(col("l_linenumber")).cast("long").as("mode_line"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact discrete percentiles (ANSI WITHIN GROUP): percentile_disc
    * picks an actual input value (the first whose cumulative fraction
    * reaches p), so there is no interpolation arithmetic to drift
    * between engines — bit-exact across dialects. */
  val aggPercentileDisc: Q = Q.shared(
    "agg_percentile_disc",
    """select o_orderstatus,
      |  percentile_disc(0.5) within group (order by o_totalprice) as median_price,
      |  percentile_disc(0.9) within group (order by o_totalprice) as p90_price
      |from orders group by o_orderstatus
      |order by o_orderstatus""".stripMargin)

  /** Continuous (interpolated) percentiles. Interpolation arithmetic is
    * engine-specific in general, but over INTEGER-valued quantities with
    * quarter fractions every term (a + (b-a)·f, f ∈ {0, ¼, ½, ¾}) is
    * exact in binary floating point — so the entry is still bit-exact
    * cross-engine. Distributed shape: one sort-based aggregate per
    * group, same as percentile_disc. */
  val aggPercentileCont: Q = Q.shared(
    "agg_percentile_cont",
    """select l_returnflag,
      |  percentile_cont(0.25) within group (order by l_quantity) as q1,
      |  percentile_cont(0.5) within group (order by l_quantity) as median,
      |  percentile_cont(0.75) within group (order by l_quantity) as q3
      |from lineitem group by l_returnflag
      |order by l_returnflag""".stripMargin)

  // ---- Multi-dimensional aggregation (beyond-reference: the reference's
  // AST has only plain GROUP BY, ast.rs:1270-1281) ------------------------

  /** GROUP BY ALL / ORDER BY ALL — the dialect shorthand that groups on
    * every non-aggregate select item and orders on the whole select
    * list; both engines resolve it at analysis time to the same
    * explicit plan, so this pins the RESOLUTION rule, not new
    * execution. */
  val aggGroupByAll: Q = Q.shared(
    "agg_group_by_all",
    """select o_orderstatus, o_orderpriority,
      |  cast(count(*) as bigint) as cnt,
      |  cast(sum(cast(floor(o_totalprice) as bigint)) as bigint) as whole_units
      |from orders
      |group by all
      |order by all""".stripMargin)

  /** ROLLUP: hierarchical subtotals + grand total; grouping() marks the
    * synthesized NULL rows apart from data NULLs. */
  val aggRollup: Q = Q.shared(
    "agg_rollup",
    """select l_returnflag, l_linestatus,
      |  cast(grouping(l_returnflag) as bigint) as g_rf,
      |  cast(grouping(l_linestatus) as bigint) as g_ls,
      |  count(*) as cnt,
      |  cast(sum(cast(l_quantity as decimal(12,2))) as double) as sum_qty
      |from lineitem
      |group by rollup (l_returnflag, l_linestatus)
      |order by l_returnflag asc nulls first, l_linestatus asc nulls first""".stripMargin)

  /** CUBE: all 2^k grouping combinations. */
  val aggCube: Q = Q.shared(
    "agg_cube",
    """select o_orderstatus, o_orderpriority, count(*) as cnt
      |from orders
      |group by cube (o_orderstatus, o_orderpriority)
      |order by o_orderstatus asc nulls first, o_orderpriority asc nulls first""".stripMargin)

  /** Explicit GROUPING SETS. */
  val aggGroupingSets: Q = Q.shared(
    "agg_grouping_sets",
    """select n_regionkey, n_nationkey, count(*) as cnt
      |from nation
      |group by grouping sets ((n_regionkey), (n_nationkey))
      |order by n_regionkey asc nulls first, n_nationkey asc nulls first""".stripMargin)

  /** PIVOT (long → wide): per-priority counts by order status. The
    * oracle spells it as conditional aggregation — same result, and it
    * documents exactly what PIVOT computes. */
  val pivotStatus: Q = Q.df(
    "pivot_status",
    """select o_orderpriority,
      |  count(*) filter (where o_orderstatus = 'F') as f,
      |  count(*) filter (where o_orderstatus = 'O') as o,
      |  count(*) filter (where o_orderstatus = 'P') as p
      |from orders group by o_orderpriority
      |order by o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    // coalesce: Spark's PIVOT yields NULL for a (priority, status) cell
    // with no rows, the oracle's count FILTER yields 0 — align on 0.
    s.sql("""select o_orderpriority,
            |  coalesce(f, cast(0 as bigint)) as f,
            |  coalesce(o, cast(0 as bigint)) as o,
            |  coalesce(p, cast(0 as bigint)) as p
            |from (select o_orderpriority, o_orderstatus from orders)
            |pivot (count(*) for o_orderstatus in ('F' as f, 'O' as o, 'P' as p))
            |order by o_orderpriority""".stripMargin)
  }

  /** UNPIVOT (wide → long): three lineitem measures into (metric,
    * value) rows; the oracle is the equivalent UNION ALL. */
  val unpivotMeasures: Q = Q.df(
    "unpivot_measures",
    """with src as (select * from lineitem where l_orderkey < 100)
      |select l_orderkey, l_partkey, metric, value from (
      |  select l_orderkey, l_partkey, 'qty' as metric, l_quantity as value from src
      |  union all
      |  select l_orderkey, l_partkey, 'price', l_extendedprice from src
      |  union all
      |  select l_orderkey, l_partkey, 'disc', l_discount from src)
      |order by l_orderkey, l_partkey, metric""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql("""select l_orderkey, l_partkey, metric, value
            |from (select l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount
            |      from lineitem where l_orderkey < 100)
            |unpivot (value for metric in (
            |  l_quantity as qty, l_extendedprice as price, l_discount as disc))
            |order by l_orderkey, l_partkey, metric""".stripMargin)
  }

  /** String function breadth #2: split_part/lpad/replace/reverse/
    * levenshtein — identical spellings and semantics in both dialects. */
  val exprString2: Q = Q.shared(
    "expr_string_funcs2",
    """select p_partkey,
      |  split_part(p_name, ' ', 2) as second_word,
      |  lpad(p_brand, 12, '*') as padded,
      |  replace(p_type, 'ECONOMY', 'ECO') as repl,
      |  reverse(p_name) as rev,
      |  cast(levenshtein(p_brand, p_type) as bigint) as lev
      |from part order by p_partkey limit 300""".stripMargin)

  // ---- Windows (beyond-reference surface, SURVEY §2.9) ------------------

  /** Navigation + distribution window functions: lag/lead/first_value/
    * ntile over a named WINDOW clause (deterministic total order inside
    * each partition via the unique trailing key). */
  val windowLeadLag: Q = Q.shared(
    "window_lead_lag",
    """select o_orderkey, o_custkey,
      |  lag(o_orderkey) over w as prev_key,
      |  lead(o_orderkey) over w as next_key,
      |  first_value(o_orderkey) over w as first_key,
      |  cast(ntile(4) over w as bigint) as quartile
      |from orders
      |where o_custkey < 100
      |window w as (partition by o_custkey order by o_orderdate, o_orderkey)
      |order by o_custkey, o_orderkey""".stripMargin)

  val windowRank: Q = Q.shared(
    "window_rank_topn",
    """select c_custkey, o_orderkey, o_totalprice, rnk from (
      |  select o_custkey as c_custkey, o_orderkey, o_totalprice,
      |    cast(rank() over (partition by o_custkey
      |                      order by o_totalprice desc, o_orderkey) as bigint) as rnk
      |  from orders) w
      |where rnk <= 3
      |order by c_custkey, rnk, o_orderkey""".stripMargin)

  val windowRunningSum: Q = Q.shared(
    "window_running_sum",
    s"""select o_custkey, o_orderkey,
       |  cast(sum(${sqlM("o_totalprice")}) over (
       |    partition by o_custkey order by o_orderdate, o_orderkey
       |    rows between unbounded preceding and current row) as double) as running_total
       |from orders
       |where o_custkey < 50
       |order by o_custkey, o_orderkey""".stripMargin)

  /** Rolling exact median over a trailing 7-row frame — the smoother an
    * anomaly pipeline prefers over a rolling MEAN (one spike day drags a
    * mean for a week; a median shrugs it off). Spark refuses a frame on
    * `median`/`percentile` window aggregates, so the Spark side sorts
    * the ≤7-element frame via collect_list — bounded by the frame
    * width, not the series — and indexes the middle; DuckDB runs its
    * native framed median. With integer daily counts the
    * even-cardinality interpolation is an exact x.5 double, so the
    * surface needs no rounding. Per-type partitioned frames:
    * series-parallel at any scale. */
  val windowRollingMedian: Q = Q.df(
    "window_rolling_median",
    """with daily as (
      |  select event_type, cast(ts as date) as day,
      |    cast(count(*) as bigint) as cnt
      |  from events group by event_type, cast(ts as date))
      |select event_type, day, cnt,
      |  median(cnt) over (partition by event_type order by day
      |    rows between 6 preceding and current row) as med7
      |from daily order by event_type, day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.df(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    val arr = sort_array(collect_list(col("cnt")).over(w7))
    val n = size(arr)
    val med = when(n % 2 === 1,
      element_at(arr, ((n + 1) / 2).cast("int")).cast("double"))
      .otherwise((element_at(arr, (n / 2).cast("int"))
        + element_at(arr, (n / 2).cast("int") + 1))
        .cast("double") / 2.0d)
    daily.select(col("event_type"), col("day"), col("cnt"),
        med.as("med7"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Interval-based RANGE frame: a sliding 30-day window keyed on the
    * ORDER BY date value (peers included by value, not row position) —
    * deterministic even under order-date ties. */
  val windowRangeFrame: Q = Q.shared(
    "window_range_frame",
    """select o_custkey, o_orderkey,
      |  cast(count(*) over (
      |    partition by o_custkey order by cast(o_orderdate as date)
      |    range between interval 30 day preceding and current row) as bigint)
      |    as cnt_30d
      |from orders
      |where o_custkey < 50
      |order by o_custkey, o_orderkey""".stripMargin)

  /** Distribution window functions: percent_rank/cume_dist (rank-ratio
    * doubles — a single integer division, bit-identical cross-engine)
    * plus frame-pinned first/last/nth_value. The unique o_orderkey in
    * the ORDER BY makes every rank deterministic; last/nth use the full
    * unbounded frame (the default RANGE..CURRENT ROW frame would make
    * last_value degenerate to the current row). */
  val windowDistribution: Q = Q.shared(
    "window_distribution",
    """select o_orderkey, o_orderpriority,
      |  percent_rank() over w as pr,
      |  cume_dist() over w as cd,
      |  first_value(o_orderkey) over w as first_key,
      |  last_value(o_orderkey) over (
      |    partition by o_orderpriority order by o_orderkey
      |    rows between unbounded preceding and unbounded following) as last_key,
      |  nth_value(o_orderkey, 2) over (
      |    partition by o_orderpriority order by o_orderkey
      |    rows between unbounded preceding and unbounded following) as second_key
      |from orders
      |where o_custkey % 50 = 0
      |window w as (partition by o_orderpriority order by o_orderkey)
      |order by o_orderkey""".stripMargin)

  /** User-facing higher-order functions over arrays — transform /
    * filter / aggregate / exists / forall / zip_with, the lambda surface
    * the vector and text kernels build on, pinned as an entry of its
    * own. Arrays are bigint sequences derived from the row key, so every
    * output is integer-exact; the oracle spells the same semantics in
    * DuckDB's list_* vocabulary. The array-valued results are projected
    * through array_to_string/array_join IN the compared SELECT on both
    * sides: the full content is still hash-checked element by element,
    * but the driver's pandas sort (which cannot order ndarray cells)
    * sees plain strings. */
  val exprHigherOrder: Q = Q.df(
    "expr_higher_order",
    """with b as (select n_nationkey,
      |    range(1, 2 + n_nationkey % 7) as xs from nation)
      |select n_nationkey,
      |  list_reduce(list_prepend(cast(0 as bigint), xs),
      |    (a, x) -> a + x) as hof_sum,
      |  array_to_string(list_transform(xs, x -> x * x), ',') as squares,
      |  coalesce(array_to_string(
      |    list_filter(xs, x -> x % 2 = 0), ','), '') as evens,
      |  len(list_filter(xs, x -> x > 5)) > 0 as has_gt5,
      |  len(list_filter(xs, x -> x < 1)) = 0 as all_ge1,
      |  array_to_string(list_transform(range(1, len(xs) + 1),
      |    i -> xs[i] + xs[len(xs) - i + 1]), ',') as mirror_sums
      |from b order by n_nationkey""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "nation")
      .select(col("n_nationkey"),
        sequence(lit(1L), lit(1L) + col("n_nationkey") % 7).as("xs"))
      .select(col("n_nationkey"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x).as("hof_sum"),
        array_join(transform(col("xs"), x => (x * x).cast("string")), ",")
          .as("squares"),
        array_join(filter(col("xs"), x => x % 2 === 0).cast("array<string>"),
          ",").as("evens"),
        exists(col("xs"), x => x > 5).as("has_gt5"),
        forall(col("xs"), x => x >= 1).as("all_ge1"),
        array_join(zip_with(col("xs"), reverse(col("xs")),
          (a, b) => (a + b).cast("string")), ",").as("mirror_sums"))
      .orderBy(col("n_nationkey"))
  }

  /** GROUPING() flags under ROLLUP — how a client tells a subtotal row's
    * NULL from a data NULL, the disambiguation half of multi-dim
    * aggregation. Same spelling in both dialects. */
  val aggGroupingId: Q = Q.shared(
    "agg_grouping_id",
    """select o_orderstatus, o_orderpriority,
      |  cast(grouping(o_orderstatus) as bigint) as g_status,
      |  cast(grouping(o_orderpriority) as bigint) as g_prio,
      |  count(*) as cnt
      |from orders
      |group by rollup(o_orderstatus, o_orderpriority)
      |order by g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)

  /** Explicit NULLS FIRST placement with LIMIT — the placement decides
    * WHICH rows survive the limit, so the compared set genuinely tests
    * null-ordering semantics (engines disagree on the default: Spark
    * sorts nulls first ascending, DuckDB last). */
  val sortNullsPlacement: Q = Q.shared(
    "sort_nulls_placement",
    """select event_id, nullif(event_type, 'view') as et
      |from events
      |order by et nulls first, event_id
      |limit 100""".stripMargin)

  /** Lateral column aliases (an alias referenced by LATER select-list
    * expressions — the chained-derivation SQL shape analysts write
    * instead of nesting subqueries) + ORDER BY ALL (every select-list
    * column, left to right). The same text is valid in both engines;
    * doc_id is unique so ORDER BY ALL is totally deterministic. Casts
    * keep both sides BIGINT (DuckDB would derive int32 arithmetic). */
  val exprLateralAlias: Q = Q.shared(
    "expr_lateral_alias",
    """select doc_id,
      |  cast(n_chars + 1 as bigint) as b,
      |  cast(b * 2 as bigint) as c,
      |  cast(c - b as bigint) as d
      |from documents
      |order by all""".stripMargin)

  /** ntile bucketing — equal-frequency quartiles per partition, the
    * windowed form pipelines use for per-group percentile banding (e.g.
    * "top quartile of documents per source by length"). Deterministic:
    * the ORDER BY key is unique within each partition. */
  val windowNtile: Q = Q.shared(
    "window_ntile",
    """select o_orderkey, o_orderpriority,
      |  cast(ntile(4) over (partition by o_orderpriority
      |    order by o_orderkey) as bigint) as quartile
      |from orders where o_custkey % 50 = 0
      |order by o_orderkey""".stripMargin)

  /** Bitwise aggregates over grouped flag words — the set-union /
    * set-intersection of bitmask columns (feature flags, permission
    * words) without exploding them to rows. */
  val aggBitwise: Q = Q.df(
    "agg_bitwise",
    """select o_orderstatus,
      |  bit_and(o_orderkey % 256) as mask_and,
      |  bit_or(o_orderkey % 256) as mask_or,
      |  bit_xor(o_orderkey % 256) as mask_xor
      |from orders group by o_orderstatus
      |order by o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        bit_and(col("o_orderkey") % 256).as("mask_and"),
        bit_or(col("o_orderkey") % 256).as("mask_or"),
        bit_xor(col("o_orderkey") % 256).as("mask_xor"))
      .orderBy(col("o_orderstatus"))
  }

  /** Tumbling-window aggregation over the events table — the batch form
    * of the Structured Streaming query in graft.streaming. */
  val windowTumblingEvents: Q = Q.df(
    "window_tumbling_events",
    s"""select date_trunc('hour', ts) as wstart, event_type,
       |  count(*) as cnt,
       |  cast(sum(${sqlM("value")}) as double) as total
       |from events group by date_trunc('hour', ts), event_type
       |order by wstart, event_type""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(m(col("value"))).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"), col("total"))
      .orderBy(col("wstart"), col("event_type"))
  }

  /** IGNORE NULLS navigation over a sparse column — the gap-bridging
    * window surface (last-known-good reading, previous non-null event).
    * Spark spells it with the DataFrame API's ignoreNulls overloads
    * (ANSI `IGNORE NULLS` clause under the hood); DuckDB puts the
    * modifier inside the call parens, hence the split texts. Values
    * pass through unchanged (no arithmetic), so doubles are exact. */
  val windowIgnoreNulls: Q = Q.df(
    "window_ignore_nulls",
    """with b as (select o_orderkey, o_orderpriority, o_custkey,
      |  case when o_orderkey % 3 = 0 then o_totalprice end as sparse
      |  from orders)
      |select o_orderkey,
      |  last_value(sparse ignore nulls) over (
      |    partition by o_orderpriority order by o_orderkey) as last_seen,
      |  first_value(sparse ignore nulls) over (
      |    partition by o_orderpriority order by o_orderkey
      |    rows between unbounded preceding and unbounded following) as first_seen,
      |  lag(sparse ignore nulls) over (
      |    partition by o_orderpriority order by o_orderkey) as prev_seen,
      |  nth_value(sparse, 2 ignore nulls) over (
      |    partition by o_orderpriority order by o_orderkey
      |    rows between unbounded preceding and unbounded following) as second_seen
      |from b where o_custkey % 20 = 0 order by o_orderkey""".stripMargin) {
    (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wRun = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
    val wAll = wRun.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.df(s, dir, "orders")
      // WHERE precedes window evaluation in the SQL block, so the
      // filter must come before the window projections here too
      .filter(col("o_custkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice")).as("sparse"))
      .select(col("o_orderkey"),
        last(col("sparse"), ignoreNulls = true).over(wRun).as("last_seen"),
        first(col("sparse"), ignoreNulls = true).over(wAll).as("first_seen"),
        lag(col("sparse"), 1, null, ignoreNulls = true).over(wRun)
          .as("prev_seen"),
        nth_value(col("sparse"), 2, ignoreNulls = true).over(wAll)
          .as("second_seen"))
      .orderBy(col("o_orderkey"))
  }

  /** The NOT IN null trap, pinned: against an empty subquery NOT IN
    * keeps every row, but a single NULL in the subquery's output makes
    * `x NOT IN (...)` UNKNOWN for every x — zero rows — because it
    * desugars to a conjunction of `x <> v` terms and `x <> NULL` is
    * UNKNOWN. The reason planners need AntiSemi-with-null-awareness
    * (the reference marks it on JoinKind::AntiSemi null_aware handling;
    * Spark plans NullAwareAntiJoin). Same spelling both dialects. */
  val predNotInNullTrap: Q = Q.shared(
    "pred_not_in_null_trap",
    """select
      |  (select count(*) from customer where c_custkey not in
      |     (select o_custkey from orders where o_orderkey < 0)) as vs_empty,
      |  (select count(*) from customer where c_custkey not in
      |     (select case when o_orderkey % 2 = 0 then o_custkey end
      |      from orders)) as vs_nulls,
      |  (select count(*) from customer) as n_customers""".stripMargin)

  /** URL parsing — the first step of any web-corpus pipeline (domain
    * grouping, per-site dedup, crawl-policy joins). URLs are
    * synthesized deterministically from document fields (the fixture
    * has no URL column); Spark side uses the native parse_url
    * expression (codegen'd), the oracle re-derives each component with
    * anchored regexes, and the registered-domain column is the
    * last-two-labels heuristic both engines spell identically. */
  val exprUrlFuncs: Q = Q.df(
    "expr_url_funcs",
    """with u as (select doc_id,
      |    'https://' || source || '.example.org/docs/' || doc_id
      |      || '?lang=' || lang || '&ref=search' as url
      |  from documents)
      |select doc_id, url,
      |  regexp_extract(url, '^https?://([^/]+)', 1) as host,
      |  regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) as path,
      |  regexp_extract(url, '\?([^#]*)', 1) as query,
      |  regexp_extract(url, '[?&]lang=([^&#]*)', 1) as lang_param,
      |  regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
      |    '([^.]+\.[^.]+)$', 1) as domain
      |from u order by doc_id""".stripMargin) { (s, dir) =>
    Tables.df(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.org/docs/"),
          col("doc_id"), lit("?lang="), col("lang"), lit("&ref=search"))
          .as("url"))
      .select(col("doc_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"),
        regexp_extract(parse_url(col("url"), lit("HOST")),
          "([^.]+\\.[^.]+)$", 1).as("domain"))
      .orderBy(col("doc_id"))
  }

  /** Materialized-view AUTOMATIC rewrite through the driver gate: the
    * query below aggregates the BASE lineitem table; the injected
    * [[graft.plans.MvRewrite]] rule redirects it to the
    * (returnflag, linestatus, shipdate) summary and re-aggregates the
    * partials — grouping by a strict SUBSET of the MV dimensions, the
    * roll-up case that makes an MV a reusable asset rather than one
    * query's cache. The ORACLE computes from the base table in DuckDB,
    * so the hash compare proves the rewrite is semantically invisible
    * (decimal partials make the roll-up bit-exact). The rewrite firing
    * (MV scanned, base scan gone) is plan-asserted in MvRewriteSpec. */
  val mvRewriteRollup: Q = Q.df("mv_rewrite_rollup",
    """select l_returnflag, cast(count(*) as bigint) as n_items,
      |  cast(sum(cast(l_quantity as decimal(12,2))) as double) as sum_qty,
      |  cast(sum(cast(l_extendedprice as decimal(12,2))) as double)
      |    as sum_price,
      |  cast(min(cast(l_quantity as decimal(12,2))) as double) as min_qty,
      |  cast(max(cast(l_extendedprice as decimal(12,2))) as double)
      |    as max_price
      |from lineitem group by l_returnflag
      |order by l_returnflag""".stripMargin) { (s, dir) =>
    graft.plans.MvRewrite.ensure(s, dir)
    Tables.df(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        dsum(m(col("l_quantity"))).as("sum_qty"),
        dsum(m(col("l_extendedprice"))).as("sum_price"),
        min(m(col("l_quantity"))).cast("double").as("min_qty"),
        max(m(col("l_extendedprice"))).cast("double").as("max_price"))
      .orderBy(col("l_returnflag"))
  }

  /** The MV lifecycle COMPOSED through the gate: the summary is built
    * from a base slice, incrementally refreshed with a delta batch
    * (partials merged, base never re-scanned), and the rewrite then
    * answers a FULL-table aggregate from the refreshed artifact — the
    * oracle recomputes from the complete base table, so the compare
    * proves build + refresh + rewrite are jointly exact. */
  val mvIncrementalRewrite: Q = Q.df(
    "mv_incremental_rewrite",
    """select l_linestatus, cast(count(*) as bigint) as n_items,
      |  cast(sum(cast(l_extendedprice as decimal(12,2))) as double)
      |    as sum_price
      |from lineitem group by l_linestatus
      |order by l_linestatus""".stripMargin) { (s, dir) =>
    graft.plans.MvRewrite.ensureIncremental(s, dir)
    Tables.df(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        dsum(m(col("l_extendedprice"))).as("sum_price"))
      .orderBy(col("l_linestatus"))
  }

  /** Automatic JOIN-view rewrite ([[graft.plans.MvJoinRewrite]]): the
    * query spells the raw orders ⋈ customer join; the injected rule
    * redirects it to the stored pre-joined artifact — the plan scans
    * ONLY the view (spec-pinned), the dominant fact-side shuffle gone.
    * Oracle = the raw join (the rewrite must be invisible in values). */
  val mvJoinRewriteQ: Q = Q.df(
    "mv_join_rewrite",
    """select o.o_orderkey, o.o_custkey, c.c_nationkey as nat
      |from orders o join customer c on o.o_custkey = c.c_custkey
      |order by o.o_orderkey""".stripMargin) { (s, dir) =>
    graft.plans.MvJoinRewrite.ensure(s, dir)
    Tables.df(s, dir, "orders")
      .join(Tables.df(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("c_nationkey").as("nat"))
      .orderBy(col("o_orderkey"))
  }

  /** The registry's SECOND join view served automatically: the same
    * rule dispatches supplier ⋈ nation to its own stored artifact —
    * multi-view dispatch as a verified surface, not a code path
    * ([[graft.plans.MvJoinRewrite.JoinViewDesc]] registry). */
  val mvJoinRegistryQ: Q = Q.df(
    "mv_join_registry",
    """select s.s_suppkey, s.s_nationkey, n.n_name
      |from supplier s join nation n on s.s_nationkey = n.n_nationkey
      |order by s.s_suppkey""".stripMargin) { (s, dir) =>
    graft.plans.MvJoinRewrite.ensure(s, dir)
    Tables.df(s, dir, "supplier")
      .join(Tables.df(s, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  /** The COMPOSED join+aggregate rewrite: the query spells
    * orders ⋈ customer + GROUP BY, the rule redirects it to the
    * pre-aggregated join summary and re-aggregates the stored partials
    * (grouping by a SUBSET of the summary dims — the roll-up case).
    * Oracle recomputes from the raw tables, so the compare proves the
    * whole chain (join match → summary → partial roll-up) exact; the
    * plan shape (summary scanned, both base scans gone) is pinned in
    * [[graft.MvRewriteSpec]]. */
  val mvJoinAggRewriteQ: Q = Q.df(
    "mv_join_agg_rewrite",
    """select c.c_nationkey, cast(count(*) as bigint) as n_orders,
      |  cast(sum(cast(o_totalprice as decimal(12,2))) as double)
      |    as sum_price
      |from orders o join customer c on o.o_custkey = c.c_custkey
      |group by c.c_nationkey
      |order by c.c_nationkey""".stripMargin) { (s, dir) =>
    graft.plans.MvJoinRewrite.ensure(s, dir)
    Tables.df(s, dir, "orders")
      .join(Tables.df(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(m(col("o_totalprice"))).as("sum_price"))
      .orderBy(col("c_nationkey"))
  }

  /** Filter COMPOSED with the join-view rewrite: the predicate (pushed
    * below the join by the optimizer) references only view columns, so
    * the rule collects it from the relation side and re-applies it on
    * the stored view — an inner equi-join preserves single-side row
    * predicates. The query never scans a base table (spec-pinned);
    * oracle = the raw filtered join. */
  val mvJoinFilterRewriteQ: Q = Q.df(
    "mv_join_filter_rewrite",
    """select o.o_orderkey, c.c_nationkey as nat
      |from orders o join customer c on o.o_custkey = c.c_custkey
      |where o.o_totalprice > 150000
      |order by o.o_orderkey""".stripMargin) { (s, dir) =>
    graft.plans.MvJoinRewrite.ensure(s, dir)
    Tables.df(s, dir, "orders")
      .join(Tables.df(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_totalprice") > 150000)
      .select(col("o_orderkey"), col("c_nationkey").as("nat"))
      .orderBy(col("o_orderkey"))
  }

  /** Dim filter COMPOSED with the join+aggregate rewrite: the
    * predicate references only summary dimensions, so it drops whole
    * partial groups exactly as it drops their base rows — the query is
    * served from the pre-aggregated summary, filtered and rolled up. */
  val mvJoinAggFilterRewriteQ: Q = Q.df(
    "mv_join_agg_filter_rewrite",
    """select c.c_nationkey, cast(count(*) as bigint) as n_orders,
      |  cast(sum(cast(o_totalprice as decimal(12,2))) as double)
      |    as sum_price
      |from orders o join customer c on o.o_custkey = c.c_custkey
      |where c.c_mktsegment = 'BUILDING'
      |group by c.c_nationkey
      |order by c.c_nationkey""".stripMargin) { (s, dir) =>
    graft.plans.MvJoinRewrite.ensure(s, dir)
    Tables.df(s, dir, "orders")
      .join(Tables.df(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(m(col("o_totalprice"))).as("sum_price"))
      .orderBy(col("c_nationkey"))
  }

  /** SQL SCRIPTING (Spark 4's procedural surface: BEGIN…END compound
    * statements, DECLAREd local variables, WHILE control flow): the
    * script partitions the orders count across five loop iterations by
    * key residue and accumulates into a session-local variable — the
    * final SELECT only reconciles with the oracle's one-shot count if
    * every iteration really ran and every SET re-bound the variable.
    * The scripting conf is a parser capability toggle (no effect on
    * non-script SQL), enabled once for the session. */
  val sqlScriptingLoop: Q = Q.df(
    "sql_scripting_loop",
    """select cast(count(*) as bigint) as n_orders,
      |  cast(5 as bigint) as rounds from orders""".stripMargin) {
    (s, dir) =>
      Tables.registerAll(s, dir)
      s.conf.set("spark.sql.scripting.enabled", "true")
      s.sql(
        """BEGIN
          |  DECLARE total BIGINT DEFAULT 0;
          |  DECLARE i BIGINT DEFAULT 0;
          |  WHILE i < 5 DO
          |    SET total = total +
          |      (SELECT count(*) FROM orders WHERE o_orderkey % 5 = i);
          |    SET i = i + 1;
          |  END WHILE;
          |  SELECT total AS n_orders, i AS rounds;
          |END""".stripMargin)
  }

  val queries: Seq[Q] = Seq(
    mvRewriteRollup, mvIncrementalRewrite, mvJoinRewriteQ,
    mvJoinRegistryQ, mvJoinAggRewriteQ,
    mvJoinFilterRewriteQ, mvJoinAggFilterRewriteQ,
    sqlScriptingLoop,
    exprUrlFuncs,
    windowIgnoreNulls, predNotInNullTrap,
    setopUnionAll, setopUnionDistinct, setopUnionByName,
    setopExcept, setopExceptAll,
    setopIntersect, setopIntersectAll,
    joinFullOuter, joinCross, joinSemi, joinAnti, joinUsing,
    joinRight, joinNatural, predExistsDisjunction, joinReorderCbo,
    joinReorderWide,
    joinLateral, distinctOn,
    distinctRows, sortLimitOffset, topK, rowConstant, rowValuesList,
    aggFilterClause, exprDateFuncs,
    havingFilter, aggDistinct,
    subqScalar, subqGtAll, subqLtAny, subqSingleJoin, subqInCorrelated,
    cteMultiRef, cteRecursive,
    exprCase, exprCast, exprExtract, exprString, exprArith, exprMath,
    exprMathTrig, exprNullFuncs, exprDateFuncs2, exprArraySetops,
    exprHashEncode, exprRegexpFuncs, exprString3, exprMapFuncs,
    exprExplodePos, exprExplodeOuter, exprTryArith, aggStatsRegression,
    exprTimestampFuncs,
    exprDateFuncs3,
    exprRoundModes, exprInterval,
    exprComplexTypes, exprTryCast,
    predSurface, predRegexp, predNullSafeEq, predLogicalXor, predIsTrue,
    predRowTuples, subqRowTupleIn,
    aggGroupByAll, aggRollup, aggCube, aggGroupingSets, aggPercentileDisc,
    aggPercentileCont, aggMinMaxBy,
    aggBool, aggStringAgg, aggMode,
    pivotStatus, unpivotMeasures, exprString2,
    windowRank, windowRunningSum, windowTumblingEvents, windowLeadLag,
    windowRangeFrame, windowDistribution, windowNtile, aggBitwise,
    aggGroupingId, sortNullsPlacement, exprHigherOrder, windowRollingMedian,
    exprLateralAlias)
}
