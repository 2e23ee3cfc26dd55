#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare (SURVEY §7.2.1).

Usage: oracle_check.py <sf_dir> <verify_out_dir> [query ...]

Reads <verify_out_dir>/oracle_sql.json, runs each oracle SQL in DuckDB over
the parquet tables in <sf_dir>, and compares cell-by-cell (columns sorted by
name, exact value equality — emulating a hash compare) against the Spark
result parquet written by graft.Verify.
"""
import duckdb
import glob
import os
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize one cell for exact comparison."""
    # numpy scalars -> python
    if hasattr(v, "item") and not hasattr(v, "__len__"):
        v = v.item()
    # arrays / lists -> tuple of canon
    if hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
        return tuple(canon(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def is_null(v):
    if v is None:
        return True
    try:
        return isinstance(v, float) and math.isnan(v)
    except Exception:
        return False


def compare(name, sdf, ddf):
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        return False, f"column mismatch: spark={scols} duck={dcols}"
    if len(sdf) != len(ddf):
        return False, f"row count: spark={len(sdf)} duck={len(ddf)}"
    sdf, ddf = sdf[scols], ddf[scols]
    diffs = []
    for c in scols:
        sv, dv = sdf[c].tolist(), ddf[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if is_null(a) and is_null(b):
                continue
            if canon(a) != canon(b):
                diffs.append(f"  [{c}] row {i}: spark={a!r} duck={b!r}")
                if len(diffs) >= 5:
                    return False, "value diffs:\n" + "\n".join(diffs)
    if diffs:
        return False, "value diffs:\n" + "\n".join(diffs)
    return True, f"{len(sdf)} rows x {len(scols)} cols"


# Portable DuckDB output types: anything outside this set (HUGEINT from
# window SUM, DECIMAL, TINYINT...) may hash differently from Spark's
# physical output even when values compare equal — the r4 q_pack_sequences
# trap. The value-level compare below can't see it; this lint can.
PORTABLE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE",
                  "BOOLEAN", "BLOB"}


def lint_types(con, name, sql):
    """DESCRIBE the oracle SQL; return list of (col, type) outside the
    portable set. LIST types (nested included) are portable iff the
    element type is — strip [] suffixes in a loop, not once."""
    bad = []
    for col, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
        t = typ.strip()
        while t.endswith("[]"):
            t = t[:-2].strip()
        if t not in PORTABLE_TYPES:
            bad.append((col, typ))
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # Large-SF sweeps: bound DuckDB's memory and let it spill — the r12
    # sf1.0 sweep's q_etl_cdc_apply oracle was OOM-killed at 130 GB
    # without a limit (DuckDB defaults to ~80% of RAM and the window
    # CTEs there are corpus-sized). Opt-in via env so the sf0.01 dev
    # loop keeps zero overhead.
    mem = os.environ.get("GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/graft_duck_spill'")
        # aggregate states (notably struct extrema) are per-thread and
        # partially untracked in 1.0.0 — fewer threads caps the real rss
        con.execute(f"SET threads TO {os.environ.get('GRAFT_DUCK_THREADS', '4')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            bad = lint_types(con, name, oracle[name])
        except Exception as e:
            print(f"ERROR    {name}: type lint DESCRIBE failed: {e}")
            n_fail += 1
            continue
        if bad:
            # report the lint but FALL THROUGH to the value compare: a
            # non-portable output type must not mask an underlying value
            # divergence (both findings print; the query counts as ONE
            # failure either way)
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"TYPELINT {name}: non-portable oracle output ({cols}) "
                  f"— cast to one of {sorted(PORTABLE_TYPES)}")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark result parquet)")
            n_fail += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
            ddf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(name, sdf, ddf)
        if bad:
            ok = False
            msg += " [values compared despite TYPELINT above]"
        print(f"{'PASS' if ok else 'FAIL':8} {name}: {msg}")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
