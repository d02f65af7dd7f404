#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same fixture tables, and
compare (sorted columns, sorted rows, exact values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"select * from '{out_dir}/{name}/*.parquet'")
            got_cols = list(got.columns)
            got_types = dict(zip(got_cols, (str(t) for t in got.types)))
            got_rows = got.fetchall()
            want = con.sql(sql)
            want_cols = list(want.columns)
            want_types = dict(zip(want_cols, (str(t) for t in want.types)))
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # Driver parity: the real gate loads the parquet into pandas and
        # sort_values on ALL columns — ndarray cells (any LIST/array
        # column) crash it with "unhashable type". Fail here too so an
        # array-typed output never reaches the driver (r7: 3 red rows).
        unsortable = [c for c, t in got_types.items()
                      if "[]" in t or t.startswith(("LIST", "STRUCT", "MAP"))]
        if unsortable:
            print(f"FAIL {name}: array/nested output cols {unsortable} "
                  "(driver pandas sort_values crashes on ndarray cells — "
                  "scalarize via array_to_string/array_join)")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        wc, wr = canon(want_rows, want_cols)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        # HUGEINT guard: DuckDB widens sum(BIGINT)/chained-CTE sums to
        # HUGEINT (int128). pandas renders HUGEINT differently from
        # int64 and the driver's hash is dtype-sensitive, so an oracle
        # column typed HUGEINT is driver-red even when every value
        # matches (r8: agg_group_by_all, events_attribution,
        # graph_pagerank — the THIRD round this class bit). Hard-fail
        # it here, exactly like the array-column guard above: the fix
        # is always `cast(... as bigint)` in the oracle SQL.
        huge = [c for c, t in want_types.items()
                if t in ("HUGEINT", "UHUGEINT")]
        if huge:
            print(f"FAIL {name}: oracle cols {huge} typed HUGEINT "
                  "(DuckDB sum-widening; driver hash is dtype-sensitive "
                  "— wrap in cast(... as bigint) in the oracle SQL)")
            n_fail += 1
            continue
        # Dtype audit: Python == is cross-type (1 == 1.0), but the
        # driver's hash is dtype-sensitive — a bigint/double mismatch
        # passes the value compare here and still fails the real gate
        # (this artifact cost two rounds: tpch_ref_q12, corpus_stats_
        # tokens). Integer-family widths are allowed to differ (the
        # driver compares values after a common cast); int-vs-float and
        # anything-vs-string are not. HUGEINT is deliberately NOT in
        # the int family — it can only reach here on the Spark side
        # (never produced), and the oracle side hard-fails above.
        def family(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                     "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE") or t.startswith("DECIMAL"):
                return "float"
            return t
        mism = [(c, got_types[c], want_types[c]) for c in gc
                if family(got_types[c]) != family(want_types[c])]
        if mism:
            print(f"FAIL {name}: dtype mismatch {mism}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            print(f"  got : {gr[:3]}")
            print(f"  want: {wr[:3]}")
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(gr, wr)):
            if not all(eq(x, y) for x, y in zip(g, w)):
                bad = (i, g, w)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} differs")
            print(f"  got : {bad[1]}")
            print(f"  want: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
