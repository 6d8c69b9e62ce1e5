#!/usr/bin/env python3
"""Local mimic of the driver's correctness compare: for every query in
the Verify output dir, run its DuckDB oracle SQL over the same parquet
tables and diff the row multisets (columns sorted by name, rows sorted,
floats rounded to 9 significant decimals). Usage:
  python3 tools/check.py /tmp/v1 /root/testdata/sf0.01 [only_query ...]
"""
import duckdb, json, sys, math
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v1"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = set(sys.argv[3:])

con = duckdb.connect()
# optional cap so an intractable oracle (e.g. a quadratic closure at
# sf1) errors cleanly instead of OOM-killing the box mid-suite
import os
if os.environ.get("CHECK_DUCKDB_MEM"):
    con.execute(f"SET memory_limit='{os.environ['CHECK_DUCKDB_MEM']}'")
    con.execute("SET temp_directory='.tmp'")
    # bound the spill too: a quadratic oracle otherwise fills the disk
    # (observed: 76 GB of temp blocks from one sf1 diameter closure)
    con.execute("SET max_temp_directory_size='%s'"
                % os.environ.get("CHECK_DUCKDB_TMP", "20GB"))
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
# optional override layer (CHECK_ORACLE_OVERRIDES=<path>): the sf1 gate
# swaps the quadratic diameter-closure oracles for their certificate
# forms (bounded BFS from engine-dumped witnesses + an oracle-chosen
# source sample) — see OracleSql.sf1Overrides; the driver's sf0.01
# compare never sets this. ALLOWLISTED (ADVICE r12): a stray key in the
# override file must not silently replace a stronger oracle — only the
# three quadratic diameter closures may be re-judged, and lanes judged
# under an override report OK_CERT, never a bare OK.
OVERRIDE_ALLOWLIST = {"a7_diameter", "a7_diameter_dist",
                      "a7_diameter_exact"}
overridden = set()
if os.environ.get("CHECK_ORACLE_OVERRIDES"):
    ov = json.load(open(os.environ["CHECK_ORACLE_OVERRIDES"]))
    dropped = sorted(set(ov) - OVERRIDE_ALLOWLIST)
    if dropped:
        print(f"[check] ignoring non-allowlisted override keys: {dropped}",
              file=sys.stderr)
    overridden = set(ov) & OVERRIDE_ALLOWLIST
    oracle.update({k: v for k, v in ov.items() if k in overridden})


def fixture_missing(sql):
    """Absent witness-fixture CSV -> a distinct verdict, not a read_csv
    parse error masquerading as an oracle failure."""
    import re
    for path in re.findall(r"read_csv\(\s*'([^']+)'", sql):
        if not os.path.exists(path):
            return path
    return None
status = json.load(open(f"{out}/status.json"))

# Lanes whose COMPARE (not their oracle SQL) is the intractable part at
# sf1: e11's 1.5M-request join onto ~150 rendered Cytoscape documents
# is a ~13 GB frame, and materializing it into pandas for the canon()
# multiset diff OOM-killed the box (CORRECTNESS_sf1 r10's one non-a7
# exclusion). These lanes compare INSIDE DuckDB instead: both sides
# reduce to (count, Σ hash(row)) — a streaming aggregate over the same
# rows the canon path would diff, never materialized — and equal sums
# mean equal multisets (order-independent; 64-bit hash, HUGEINT sum).
# Only exact-typed lanes qualify (BIGINT/VARCHAR/BOOLEAN — no float
# columns, so canon()'s 9-sig-decimal rounding has nothing to do).
HASH_CMP = {"e11_stream_response_cache", "s12_response_cache"}


def vnorm(x):
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NULL"
        return repr(round(x, 9))
    return str(x)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(vnorm(None if pd.isna(x) else x) for x in row)
                  for row in df.itertuples(index=False))


fails, oks, rowsonly = [], [], []
for name in sorted(status):
    if only and name not in only:
        continue
    if status[name] != "ok":
        fails.append((name, f"SPARK ERR: {status[name][:200]}"))
        continue
    if name in HASH_CMP and name in oracle:
        eng_rel = f"read_parquet('{out}/{name}/*.parquet')"
        try:
            cols = sorted(r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM {eng_rel}").fetchall())
            ocols = sorted(r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM ({oracle[name]}) __q").fetchall())
            if cols != ocols:
                fails.append((name, f"COLS spark={cols} oracle={ocols}"))
                continue
            collist = ", ".join(f'"{c}"' for c in cols)
            agg = f"count(*), sum(hash({collist}))"
            se = con.execute(f"SELECT {agg} FROM {eng_rel}").fetchone()
            oe = con.execute(
                f"SELECT {agg} FROM ({oracle[name]}) __q").fetchone()
        except Exception as e:
            fails.append((name, f"ORACLE SQL ERR: {str(e)[:300]}"))
            continue
        if se == oe:
            oks.append((name, se[0]))
        else:
            fails.append((name, f"HASH MISMATCH rows spark={se[0]} "
                                f"oracle={oe[0]} hashcmp"))
        continue
    try:
        sdf = pd.read_parquet(f"{out}/{name}")
    except Exception as e:
        fails.append((name, f"read: {e}"))
        continue
    if name not in oracle:
        rowsonly.append((name, len(sdf)))
        continue
    if name in overridden:
        miss = fixture_missing(oracle[name])
        if miss:
            fails.append((name, f"MISSING_FIXTURE {miss}"))
            continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERR: {str(e)[:300]}"))
        continue
    a, b = canon(sdf), canon(odf)
    if sorted(sdf.columns) != sorted(odf.columns):
        fails.append((name, f"COLS spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"))
    elif a == b:
        oks.append((name, len(a)))
    else:
        msg = f"rows spark={len(a)} oracle={len(b)}"
        sa, sb = set(a), set(b)
        d1 = list(sa - sb)[:3]
        d2 = list(sb - sa)[:3]
        fails.append((name, f"HASH MISMATCH {msg}\n  spark-only: {d1}\n  oracle-only: {d2}"))

for n, r in oks:
    # OK_CERT marks a certificate-form (override) verdict so the sf1
    # artifact distinguishes it from a full-oracle OK (ADVICE r12)
    print(f"{'OK_CERT' if n in overridden else 'OK'}    {n} ({r} rows)")
for n, r in rowsonly:
    print(f"ROWS  {n} ({r} rows, no oracle)")
for n, m in fails:
    print(f"FAIL  {n}: {m}")
print(f"\n{len(oks)} ok, {len(rowsonly)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)
