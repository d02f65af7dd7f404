package graft.tpch

import org.apache.spark.sql.DataFrame

import graft.Q

/** The reference's 22 VERBATIM TPC-H texts executed end-to-end.
  *
  * Each entry registers the synthesized canonical schema ([[RefSchema]])
  * and runs the unmodified `/root/reference/sql/tpchN.sql` text through
  * `spark.sql` — the same corpus the reference's planner test suite
  * optimizes (`doradb-tpch-tests/tests/rule_optimize.rs:164-181`,
  * `src/lib.rs:6-210`) but cannot execute (its physical layer is
  * unimplemented). The DuckDB oracle runs the SAME text (with table
  * identifiers renamed to the generation CTEs) over the SAME
  * deterministic synthesis, so the driver's row/schema/hash compare
  * covers real data flow through all 22 shapes: aggregation pushdown
  * (q1), correlated MIN (q2), top-k (q3/q10/q18), EXISTS (q4/q21/q22),
  * multi-way join graphs (q5/q7/q8/q9), CASE pivots (q12/q14), outer
  * join + double grouping (q13), CTE + scalar subquery (q15), NOT IN
  * (q16), correlated AVG (q17), disjunctive DNF (q19), nested IN
  * chains (q20).
  *
  * q18's unaliased `sum(l_quantity)` output column is renamed
  * `sum_l_quantity` on BOTH sides (parentheses are not writable parquet
  * field names), and q9's oracle re-aliases its `nation` output column
  * (the mechanical table rename also hits that alias; the Spark side is
  * untouched). Everything else flows through as-is.
  */
object RefTpch {

  private def entry(n: Int): Q = {
    val name = s"tpch_ref_q$n"
    n match {
      case 18 =>
        Q.df(name,
          s"""select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  "sum(l_quantity)" as sum_l_quantity
             |from (
             |${RefSchema.oracleFor(18)}
             |) t""".stripMargin) { (s, dir) =>
          RefSchema.ensureRegistered(s, dir)
          s.sql(RefSchema.verbatim(18))
            .withColumnRenamed("sum(l_quantity)", "sum_l_quantity")
        }
      case 9 =>
        Q.df(name,
          s"""select ref_nation as nation, o_year, sum_profit
             |from (
             |${RefSchema.oracleFor(9)}
             |) t""".stripMargin) { (s, dir) =>
          RefSchema.ensureRegistered(s, dir)
          s.sql(RefSchema.verbatim(9))
        }
      case 12 =>
        // Oracle-side canonicalization only (the Spark side runs the
        // verbatim text): DuckDB's sum(int) yields HUGEINT, which the
        // driver's pandas layer coerces to float64 while Spark emits
        // int64 — same values, divergent dtype-sensitive hash.
        Q.df(name,
          s"""select l_shipmode,
             |  cast(high_line_count as bigint) as high_line_count,
             |  cast(low_line_count as bigint) as low_line_count
             |from (
             |${RefSchema.oracleFor(12)}
             |) t order by l_shipmode""".stripMargin) { (s, dir) =>
          RefSchema.ensureRegistered(s, dir)
          s.sql(RefSchema.verbatim(12))
        }
      case _ =>
        Q.df(name, RefSchema.oracleFor(n)) { (s, dir) =>
          RefSchema.ensureRegistered(s, dir)
          s.sql(RefSchema.verbatim(n))
        }
    }
  }

  val queries: Seq[Q] = (1 to 22).map(entry)
}
