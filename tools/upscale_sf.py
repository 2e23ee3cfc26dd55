#!/usr/bin/env python3
"""Deterministic x10 upscaler: sf0.1 -> a synthetic "sf1.0" for local
scale rehearsal (SURVEY §6 / judge r8 task 3).

NOT a replacement for driver-generated testdata (read-only, never
regenerated here) — this derives a 10x corpus from sf0.1 with the
same schemas and per-replica key shifts so every join/dup/cluster
structure of the base corpus replicates linearly:

- dims (region, nation) stay as-is; every fact/bridge key is shifted
  by `replica * (max_key + 1)` consistently on both sides of each FK
  (orders.o_orderkey and lineitem.l_orderkey move together, etc.),
  so join fan-outs scale exactly 10x with zero cross-replica hits.
- documents: replica r>0 rewrites ~1/2 of tokens (seeded by
  (doc_id, position, r)) into a bounded replacement vocab, so
  cross-replica 3-shingle Jaccard lands ~0.07 — BELOW the 0.1
  near-dup threshold. The corpus's INTERNAL dup structure (exact
  dups, planted near-dups) replicates 10x; replicas don't pair with
  each other, keeping pair frames linear — the honest scale shape.
- embeddings: replica r rotates the vector by r positions (norm- and
  distribution-preserving; cos(v, rot_r(v)) is far from 1), so each
  replica forms its own neighborhoods and recall ground truth scales
  with the corpus.

Usage: upscale_sf.py <src_sf_dir> <out_dir> [factor=10]
"""
import os
import sys

import duckdb

SRC, OUT = sys.argv[1], sys.argv[2]
F = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
con.execute(f"SET threads TO 8")


def md5u32(expr):
    """Stable unsigned-32 hash of a SQL expression: first 8 hex chars of
    md5, assembled per nibble — the same engine-portable spelling the
    Scala oracles use (Llm.md5Hex32Sql). DuckDB's hash() is NOT
    guaranteed stable across DuckDB versions (ADVICE r9): a regenerated
    corpus after an upgrade would silently diverge from the corpus prior
    bench/correctness numbers were taken on. md5 is content-defined and
    version-independent."""
    return f"""list_sum(list_transform(range(8), c ->
      CAST(instr('0123456789abcdef',
        substr(md5(CAST({expr} AS VARCHAR)), CAST(c + 1 AS INT), 1)) - 1
        AS BIGINT) << CAST(4 * (7 - c) AS INT)))"""


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t, sql):
    con.execute(f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")


con.execute(f"CREATE TABLE reps AS SELECT unnest(generate_series(0, {F - 1})) AS r")

# key spans (shift unit per replica, disjoint across replicas)
spans = {}
for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
             ("part", "p_partkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("events", "user_id"),
             ("documents", "doc_id"), ("embeddings", "vec_id")]:
    spans[k] = con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]

# dims: pass through unchanged
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

write("customer", f"""
  SELECT c_custkey + r * {spans['c_custkey']} AS c_custkey,
         c_name || '_' || r AS c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN reps""")

write("supplier", f"""
  SELECT s_suppkey + r * {spans['s_suppkey']} AS s_suppkey,
         s_name || '_' || r AS s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN reps""")

write("part", f"""
  SELECT p_partkey + r * {spans['p_partkey']} AS p_partkey,
         p_name || '_' || r AS p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')} CROSS JOIN reps""")

write("orders", f"""
  SELECT o_orderkey + r * {spans['o_orderkey']} AS o_orderkey,
         o_custkey + r * {spans['c_custkey']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN reps""")

write("lineitem", f"""
  SELECT l_orderkey + r * {spans['o_orderkey']} AS l_orderkey,
         l_partkey + r * {spans['p_partkey']} AS l_partkey,
         l_suppkey + r * {spans['s_suppkey']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN reps""")

write("events", f"""
  SELECT event_id + r * {spans['event_id']} AS event_id, ts,
         user_id + r * {spans['user_id']} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN reps""")

# documents: replica 0 verbatim; r>0 rewrites every token whose seeded
# coin (doc_id, pos, r) lands 0 mod 2 into a 997-word replacement vocab
# (bounded vocab growth; ~(1/2)^3 = 12.5% of 3-shingles survive -> pair
# Jaccard ~0.07 < the 0.1 threshold, so replicas never pair up).
write("documents", f"""
  SELECT doc_id + r * {spans['doc_id']} AS doc_id, text, lang, source,
         len(text) AS n_chars
  FROM (
    SELECT doc_id, r,
           CASE WHEN r = 0 THEN text ELSE
             array_to_string(
               [CASE WHEN {md5u32("'uc_' || doc_id || '_' || i || '_' || r")} % 2 = 0
                     THEN 'w' || ({md5u32("'uv_' || doc_id || '_' || i || '_' || r")} % 997)
                     ELSE t[i] END
                FOR i IN generate_series(1, len(t))], ' ')
           END AS text,
           lang, source
    FROM (SELECT *, string_split(text, ' ') AS t
          FROM {src('documents')}) CROSS JOIN reps)""")

# embeddings: rotate by r positions (r=0 verbatim)
write("embeddings", f"""
  SELECT vec_id + r * {spans['vec_id']} AS vec_id,
         CAST(list_concat(embedding[r + 1:], embedding[:r]) AS FLOAT[])
           AS embedding,
         label
  FROM {src('embeddings')} CROSS JOIN reps""")

# provenance record (ADVICE r9): the generator + engine version that
# produced this corpus, so a silent regeneration under a different
# DuckDB can be detected against prior bench/correctness numbers
# (the md5 rewrite above is version-stable, but the record costs nothing)
ver = con.execute("SELECT version()").fetchone()[0]
with open(os.path.join(OUT, "PROVENANCE.txt"), "w") as f:
    f.write(f"upscale_sf.py src={SRC} factor={F} duckdb={ver} hash=md5-nibble\n")
print("done")
