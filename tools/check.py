#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(tools/run.sh graft.Verify <sfdir> <outdir>), then this script compares each
dumped parquet against the DuckDB oracle SQL on the same fixture tables.

Stricter than the driver: exact cell equality (bit-exact for doubles) after
sorting columns by name and rows by all values. Usage:
    tools/check.py [sfdir] [outdir] [only_query_prefix]
"""
import duckdb, glob, json, math, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = sys.argv[3] if len(sys.argv) > 3 else ""

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        return v  # exact compare; caller reports near-misses
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def fetch_rows(rel):
    cols = rel.columns
    types = [str(t) for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm(r[i]) for i in order) for r in rel.fetchall()]
    return ([cols[i] for i in order], [types[i] for i in order],
            sorted(rows, key=lambda r: tuple(map(repr, r))))

fails, passes = [], []
for name in sorted(oracle):
    if only and not name.startswith(only):
        continue
    pq = f"{out}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        fails.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        scols, stypes, srows = fetch_rows(con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')"))
        ocols, otypes, orows = fetch_rows(con.sql(oracle[name]))
    except Exception as e:
        fails.append((name, f"SQL ERROR: {str(e)[:300]}"))
        continue
    if scols != ocols:
        fails.append((name, f"COLUMNS spark={scols} oracle={ocols}"))
        continue
    if stypes != otypes:
        diff = [f"{c}: {a} vs {b}" for c, a, b in zip(scols, stypes, otypes) if a != b]
        fails.append((name, f"DTYPES {'; '.join(diff)}"))
        continue
    if len(srows) != len(orows):
        fails.append((name, f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"))
        continue
    bad = None
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            # report first diff with float near-miss detail
            detail = []
            for c, (x, y) in zip(scols, zip(a, b)):
                if x != y:
                    if isinstance(x, float) and isinstance(y, float) and math.isclose(x, y, rel_tol=1e-9):
                        detail.append(f"{c}: NEAR {x!r} vs {y!r}")
                    else:
                        detail.append(f"{c}: {x!r} vs {y!r}")
            bad = f"ROW {i}: " + "; ".join(detail[:4])
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append((name, len(srows)))

for n, r in passes:
    print(f"PASS {n} ({r} rows)")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
