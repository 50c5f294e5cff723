#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf tables and compare (row count, column names, values after
sorting columns by name and rows by all columns)."""
import sys, os, json, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            # floats compared EXACTLY: the engine is designed for
            # bit-reproducible folds (identical left-to-right order)
            if isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out, [cols[i] for i in order]

fails = 0
for name, sql in sorted(oracle.items()):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no result parquet"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{res_path}/*.parquet')")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        exp = con.execute(sql)
        erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}"); fails += 1; continue
    # native-type match (a driver could compare schemas strictly; e.g.
    # DuckDB SUM(int) is HUGEINT and must be CAST in the oracle SQL)
    gt = dict((r[0], r[1]) for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{res_path}/*.parquet')").fetchall())
    et = dict((r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall())
    tdiffs = {k: (gt.get(k), et.get(k)) for k in set(gt) | set(et) if gt.get(k) != et.get(k)}
    if tdiffs:
        print(f"FAIL {name}: type mismatch {tdiffs}"); fails += 1; continue
    g, gc = canon(grows, gcols)
    e, ec = canon(erows, ecols)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs {ec}"); fails += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fails += 1; continue
    if g != e:
        bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at sorted rows {bad}")
        for i in bad[:2]:
            print(f"   got {g[i]}\n   exp {e[i]}")
        fails += 1
        continue
    print(f"OK   {name}: {len(g)} rows")

# queries without oracle SQL (non-SQL-expressible, e.g. float-mean kmeans):
# weaker rows-only check — result parquet must exist, parse, and be non-empty
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path) or name in oracle:
        continue
    try:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{path}/*.parquet')").fetchone()[0]
    except Exception as e:
        print(f"FAIL {name}: rows-only read error: {e}"); fails += 1; continue
    if n <= 0:
        print(f"FAIL {name}: rows-only check found 0 rows"); fails += 1; continue
    print(f"OK   {name}: {n} rows (rows-only, no SQL oracle)")

print(f"{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
