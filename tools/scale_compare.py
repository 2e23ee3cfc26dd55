#!/usr/bin/env python3
"""Scale-rehearsal analysis: compare two graft.Bench JSON lines
(e.g. sf0.1 vs the synthetic sf1.0) and flag superlinear queries.

A query is flagged when t_big / t_small > factor * slack — on a 10x
corpus a healthy linear operator costs <= ~10x (usually far less,
since fixed Spark overheads amortize); anything well past the data
factor indicates a plan that does not survive scale-up (quadratic
pair space, driver-side materialization, a broadcast that stopped
fitting, a cap that stopped binding).

Usage: scale_compare.py <small_bench.json> <big_bench.json> [factor=10] [slack=1.5]
"""
import json
import sys


def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                if "queries" in d:
                    return d
    raise SystemExit(f"no bench line in {p}")


small, big = load(sys.argv[1]), load(sys.argv[2])
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5

qs, qb = small["queries"], big["queries"]
shared = sorted(set(qs) & set(qb))
rows = []
for k in shared:
    a, b = qs[k], qb[k]
    if a <= 0 or b <= 0:
        rows.append((float("inf"), k, a, b))
        continue
    rows.append((b / a, k, a, b))
rows.sort(reverse=True)

flagged = [(r, k, a, b) for r, k, a, b in rows if r > factor * slack]
print(f"shared queries: {len(shared)}  "
      f"total {small['value']:.1f}s -> {big['value']:.1f}s "
      f"({big['value'] / small['value']:.2f}x on {factor:.0f}x data)")
print(f"flagged (> {factor * slack:.0f}x): {len(flagged)}")
print(f"\n{'ratio':>7}  {'small':>7}  {'big':>7}  query   (top 25 by ratio)")
for r, k, a, b in rows[:25]:
    mark = " <-- SUPERLINEAR" if r > factor * slack else ""
    print(f"{r:7.2f}  {a:7.2f}  {b:7.2f}  {k}{mark}")
missing = sorted((set(qs) ^ set(qb)))
if missing:
    print(f"\nnot in both runs: {missing}")
sys.exit(1 if flagged else 0)
