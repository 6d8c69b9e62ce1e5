#!/usr/bin/env python3
"""Generate an ~sf1 dataset from sf0.1 (driver testdata is read-only and
ships no sf1): 10 key-shifted copies of every fact table, with text and
embeddings decorrelated per copy so dedup/ANN workloads keep a realistic
near-dup rate instead of 10 planted copies of every row.

  python3 tools/gen_sf1.py [/root/testdata/sf0.1 /tmp/graft_sf1]

- keys shift by i*max(key) per copy so supplier/part/orders stay
  consistent with lineitem's foreign keys
- documents: per-copy alphabet rotation (translate) rewrites most
  shingles -> copies are NOT near-duplicates of each other
- embeddings: per-copy Rademacher sign mask from a splitmix64-style
  avalanche hash of (dim, copy) decorrelates copies (max pairwise
  |cosine| ~0.31, asserted below; a plain linear parity like
  (d*31+i*17)%2 collapses to (d+i)%2 — only 2 distinct masks, giving
  byte-identical / exactly-negated copies)
- nation/region stay single-copy (dimensions)
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
N = 10

import os
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW cp AS SELECT unnest(generate_series(0, {N-1})) AS i")


def mx(table, col):
    # stride = max+1: 0-based id spaces (documents, embeddings, events)
    # otherwise collide once per copy boundary (id max of copy i ==
    # id 0 of copy i+1) — observed as 9 duplicate doc_ids at sf1,
    # which no driver-generated table has. max+1 is collision-free for
    # both 0-based and 1-based key spaces (1-based just leaves a gap).
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]


def gen(table, replaces, single=False):
    rep = (" EXCLUDE (i)" if not single else "") + \
        (f" REPLACE ({', '.join(replaces)})" if replaces else "")
    frm = (f"'{src}/{table}.parquet'" if single else
           f"'{src}/{table}.parquet', cp")
    con.execute(f"COPY (SELECT *{rep} FROM {frm}) TO "
                f"'{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


S, P, O, C = mx("supplier", "s_suppkey"), mx("part", "p_partkey"), \
    mx("orders", "o_orderkey"), mx("customer", "c_custkey")
L, E, U = mx("lineitem", "l_orderkey"), mx("events", "event_id"), \
    mx("events", "user_id")
D, V = mx("documents", "doc_id"), mx("embeddings", "vec_id")

alpha = "abcdefghijklmnopqrstuvwxyz"


def rot(s, i):
    return s[i:] + s[:i]


gen("nation", [], single=True)
gen("region", [], single=True)
gen("supplier", [f"s_suppkey + i*{S} AS s_suppkey"])
gen("part", [f"p_partkey + i*{P} AS p_partkey"])
gen("customer", [f"c_custkey + i*{C} AS c_custkey"])
gen("orders", [f"o_orderkey + i*{O} AS o_orderkey",
               f"o_custkey + i*{C} AS o_custkey"])
gen("lineitem", [f"l_orderkey + i*{L} AS l_orderkey",
                 f"l_suppkey + i*{S} AS l_suppkey",
                 f"l_partkey + i*{P} AS l_partkey"])
# the driver's events.ts is TIMESTAMP(NANOS) parquet; duckdb's COPY
# downcasts to us, so events go through pyarrow to keep ns — the Spark
# side must exercise the same nanosAsLong + div-1000 path as the
# driver's data
import pyarrow as pa
import pyarrow.parquet as pq
tbl = con.execute(
    f"SELECT * EXCLUDE (i) REPLACE (event_id + i*{E} AS event_id, "
    f"user_id + i*{U} AS user_id) "
    f"FROM '{src}/events.parquet', cp").arrow()
idx = tbl.schema.get_field_index("ts")
tbl = tbl.set_column(idx, "ts", tbl.column("ts").cast(pa.timestamp("ns")))
pq.write_table(tbl, f"{dst}/events.parquet", version="2.6")
print("events:", tbl.num_rows, "rows (ns)")
# documents: rotate the lowercase alphabet by the copy index — most
# shingles change, so copies are unrelated documents to the dedup ops
doc_text = ("CASE i " + " ".join(
    f"WHEN {i} THEN translate(text, '{alpha}', '{rot(alpha, i)}')"
    for i in range(N)) + " END AS text")
# translate is 1:1 — n_chars stays valid
gen("documents", [f"doc_id + i*{D} AS doc_id", doc_text])
# embeddings: per-copy deterministic sign mask over the 64 dims.
# splitmix64-style finalizer: the mask bit must avalanche in BOTH d
# and i, or copies collapse onto a handful of masks
M64 = (1 << 64) - 1


def _maskbit(d, i):
    x = (d * 0x9E3779B97F4A7C15 + i * 0xBF58476D1CE4E5B9) & M64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & M64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & M64
    x ^= x >> 31
    return x & 1


masks = {i: [1 - 2 * _maskbit(d, i) for d in range(64)]
         for i in range(N)}
# decorrelation certificate: all copies distinct, near-orthogonal
assert len({tuple(m) for m in masks.values()}) == N, "mask collision"
_dots = [sum(a * b for a, b in zip(masks[i], masks[j]))
         for i in range(N) for j in range(i + 1, N)]
assert max(abs(x) for x in _dots) <= 24, f"masks correlated: {_dots}"
emb = ("CASE i " + " ".join(
    "WHEN {0} THEN CAST(list_transform(list_zip(embedding, {1}), "
    "z -> z[1] * z[2]) AS FLOAT[])".format(i, masks[i])
    for i in range(N)) + " END AS embedding")
gen("embeddings", [f"vec_id + i*{V} AS vec_id", emb])
print("done ->", dst)
