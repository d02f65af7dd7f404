#!/usr/bin/env python3
"""Mechanize BASELINE.md's 2x rule for the current fixture vintage:
compare a bench record's per-query cells against BASELINE_v2.json.

Usage: python3 tools/bench_compare.py <bench.json> [baseline.json]

- bench.json: a BENCH_r{N}.json / target/bench_last.json line (the
  {"queries": {...}, ...} shape Bench.scala prints).
- baseline.json: defaults to BASELINE_v2.json next to this repo root.

Exit 1 if any common cell exceeds 2x its baseline (after a 0.5 s
absolute floor — sub-second cells ratio-flap with scheduler noise, so
a cell must be both >2x AND >0.5 s over its baseline to fail). New cells (no
baseline entry) and removed cells are listed informationally.
"""
import json, math, os, sys


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    try:  # pretty-printed (BASELINE_v2.json) or single-line documents
        return json.loads(txt)
    except json.JSONDecodeError:
        # a log-style file: take the last non-empty line (bench output)
        line = [l for l in txt.splitlines() if l.strip()][-1]
        return json.loads(line)


def main():
    if len(sys.argv) < 2:
        print(__doc__.strip())
        sys.exit(2)
    bench_path = sys.argv[1]
    base_path = (sys.argv[2] if len(sys.argv) > 2 else
                 os.path.join(os.path.dirname(__file__), "..",
                              "BASELINE_v2.json"))
    bench = load(bench_path).get("queries", {})
    baseline = load(base_path).get("queries", {})
    slow, failed, new, gone, ratios = [], [], [], [], []
    for name, sec in sorted(bench.items()):
        if sec < 0:
            failed.append(name)
            continue
        if name not in baseline:
            new.append(name)
            continue
        b = baseline[name]
        if b <= 0:
            continue
        r = sec / b
        ratios.append(r)
        if r > 2.0 and sec - b > 0.5:
            slow.append((name, sec, b, f"{r:.2f}x"))
    for name in sorted(baseline):
        if name not in bench:
            gone.append(name)
    if ratios:
        geomean = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        print(f"common cells: {len(ratios)}, geomean vs baseline: "
              f"{geomean:.3f}")
    if new:
        print(f"new cells (first baseline this round): {', '.join(new)}")
    if gone:
        print(f"baseline cells missing from this run: {', '.join(gone)}")
    if failed:
        print(f"== FAIL: cells with no successful sample (-1): "
              f"{', '.join(failed)} ==")
    if slow:
        print("== FAIL: cells over 2x the vintage baseline ==")
        for name, sec, b, tag in slow:
            print(f"  {name}: {sec} s vs baseline {b} s ({tag})")
    if failed or slow:
        sys.exit(1)
    print("== PASS: no failed cells, none exceeds 2x its vintage baseline ==")


if __name__ == "__main__":
    main()
