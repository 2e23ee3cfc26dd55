#!/usr/bin/env python3
"""Split a graft.Bench bench_queries.json into COLD (pass-1) and STEADY
(min of later passes) per-query regimes, and optionally ratio two such
files (small vs big corpus) per regime.

The r9 rehearsal lesson: artifact-backed queries pay their one-time
build in whichever pass first misses /tmp, so a single min-of-3 number
silently mixes "cold machine" and "rank once, serve many" regimes.
Run Bench with /tmp/graft_* cleared so pass 1 IS the cold regime, then
read both numbers explicitly.

Usage:
  cold_steady.py <bench_queries.json>                      # one run's table
  cold_steady.py <small.json> <big.json> [factor] [slack]  # ratio table
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.loads(f.read())
    runs = d["runs"]
    cold = {k: v[0] for k, v in runs.items() if v}
    steady = {k: min([x for x in v[1:] if x >= 0], default=-1.0)
              for k, v in runs.items()}
    return d, cold, steady


if len(sys.argv) == 2:
    d, cold, steady = load(sys.argv[1])
    print(f"{'query':34s} {'cold':>8s} {'steady':>8s}")
    for k in sorted(cold, key=lambda k: -cold[k]):
        print(f"{k:34s} {cold[k]:8.2f} {steady[k]:8.2f}")
    ok = [v for v in cold.values() if v >= 0]
    print(f"total cold={sum(ok):.2f}s "
          f"steady={sum(v for v in steady.values() if v >= 0):.2f}s "
          f"n={len(ok)}")
    sys.exit(0)

(_, cold_s, steady_s) = load(sys.argv[1])
(_, cold_b, steady_b) = load(sys.argv[2])
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
shared = sorted(set(cold_s) & set(cold_b))


def flag(name, small, big):
    rows = []
    for k in shared:
        a, b = small.get(k, -1), big.get(k, -1)
        if a <= 0 or b <= 0:
            rows.append((float("inf"), k, a, b))
        else:
            rows.append((b / a, k, a, b))
    rows.sort(reverse=True)
    bad = [r for r in rows if r[0] > factor * slack]
    print(f"== {name}: {len(bad)} queries over {factor}x*{slack} ==")
    for r, k, a, b in rows[:15]:
        mark = " <-- SUPERLINEAR" if r > factor * slack else ""
        print(f"{k:34s} {a:8.2f}s -> {b:8.2f}s  {r:6.1f}x{mark}")


flag("COLD (incl. one-time builds)", cold_s, cold_b)
flag("STEADY (artifact-backed)", steady_s, steady_b)
