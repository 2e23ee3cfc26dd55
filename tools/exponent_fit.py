#!/usr/bin/env python3
"""Three-point scale-exponent fit (judge r11 #2): given bench JSONs at
three scale factors, fit log t = a + e·log sf per key by least squares
and flag keys whose fitted exponent e >= the threshold (default 1.4 —
between n·log n and n^1.5). A two-point ratio cannot distinguish n^1.5
from n·log n curvature; three points can (within the fixed-overhead
floor, which is why keys faster than `min_t` seconds at the LARGEST sf
are reported but never flagged — their curvature is dominated by
constant Spark overheads, not data volume).

Usage: exponent_fit.py <small.json> <mid.json> <big.json>
         [threshold=1.4] [min_t=3.0]

Each input is a graft.Bench stdout line or bench_queries.json-style file
holding {"sf": F, "queries": {key: sec}}. Keys present in all three
files are fitted; -1 sentinels (failed runs) drop the key.
"""
import json
import math
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


def main():
    small, mid, big = (load(p) for p in sys.argv[1:4])
    thr = float(sys.argv[4]) if len(sys.argv) > 4 else 1.4
    min_t = float(sys.argv[5]) if len(sys.argv) > 5 else 3.0
    xs = [math.log(d["sf"]) for d in (small, mid, big)]
    xbar = sum(xs) / 3
    sxx = sum((x - xbar) ** 2 for x in xs)
    rows = []
    for k in sorted(big["queries"]):
        ts = [d["queries"].get(k, -1.0) for d in (small, mid, big)]
        if any(t <= 0 for t in ts):
            continue
        ys = [math.log(t) for t in ts]
        ybar = sum(ys) / 3
        e = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / sxx
        rows.append((e, k, ts))
    rows.sort(reverse=True)
    flagged = 0
    print(f"{'exponent':>8}  {'t_small':>8} {'t_mid':>8} {'t_big':>8}  key")
    for e, k, ts in rows:
        flag = " <-- FLAG" if (e >= thr and ts[2] >= min_t) else ""
        flagged += bool(flag)
        print(f"{e:8.2f}  {ts[0]:8.2f} {ts[1]:8.2f} {ts[2]:8.2f}  {k}{flag}")
    print(f"\n{len(rows)} keys fitted, {flagged} flagged "
          f"(exponent >= {thr} and t_big >= {min_t}s)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
