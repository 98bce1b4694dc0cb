#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, load the Spark result parquet, sort columns by
name (and rows), and compare values exactly. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    problems = []
    if list(exp.columns) != list(got.columns):
        problems.append(f"cols exp={list(exp.columns)} got={list(got.columns)}")
    elif len(exp) != len(got):
        problems.append(f"rows exp={len(exp)} got={len(got)}")
    else:
        e2 = exp.sort_values(list(exp.columns)).reset_index(drop=True)
        g2 = got.sort_values(list(got.columns)).reset_index(drop=True)
        for c in exp.columns:
            ev, gv = e2[c], g2[c]
            try:
                same = (ev.astype(str) == gv.astype(str)).all()
            except Exception:
                same = False
            if not same:
                bad = (ev.astype(str) != gv.astype(str))
                i = bad[bad].index[0]
                problems.append(f"col {c} differs at sorted-row {i}: exp={ev[i]!r} got={gv[i]!r} "
                                f"(dtype exp={ev.dtype} got={gv.dtype}, {bad.sum()} rows differ)")
        if not problems:
            # dtype check (schema-level)
            for c in exp.columns:
                if str(exp[c].dtype) != str(got[c].dtype):
                    problems.append(f"DTYPE-ONLY col {c}: exp={exp[c].dtype} got={got[c].dtype}")
    if problems:
        print(f"FAIL {name}: " + "; ".join(problems[:3]))
        fail += 1
    else:
        print(f"ok   {name} ({len(exp)} rows)")
        ok += 1

# rows-only queries
for d in sorted(glob.glob(f"{outdir}/q_*")):
    name = os.path.basename(d)
    if name not in oracle:
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
        print(f"rows {name}: {n}")
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
