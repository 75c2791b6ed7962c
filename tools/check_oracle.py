# Dev-only harness (driver-side python): replicates the driver correctness
# gate — runs each oracleSql in DuckDB over the sf dir and compares with
# the Verify parquet dumps. Not part of the library.
import duckdb, json, glob, os, sys
import pandas as pd, numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/target/verify_out'
con = duckdb.connect()
for f in glob.glob(f'{sf}/*.parquet'):
    name = os.path.basename(f).replace('.parquet','')
    # driver testdata is one file per table; MakeScale output is a
    # directory of part files per table
    src = f'{f}/*.parquet' if os.path.isdir(f) else f
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
# Absence-loudness (round-9): Verify records every query whose Spark side
# threw in failed_queries.json; surface them here so declared != dumped can
# never pass silently, and check declared == dumped + failed completeness.
failed_q = {}
fq_path = f'{out}/failed_queries.json'
if os.path.exists(fq_path):
    failed_q = json.load(open(fq_path))
    for n, msg in sorted(failed_q.items()):
        fails.append((n, f'SPARK QUERY FAILED: {msg[:200]}'))
for name, sql in sorted(oracle.items()):
    if name in failed_q:
        continue  # already reported above from failed_queries.json
    mydir = f'{out}/{name}'
    if not os.path.isdir(mydir):
        fails.append((name, 'NO SPARK OUTPUT')); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f'ORACLE SQL ERROR: {e}')); continue
    got = pd.concat([pd.read_parquet(p) for p in glob.glob(f'{mydir}/*.parquet')])
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append((name, f'COLS exp={list(exp.columns)} got={list(got.columns)}')); continue
    if len(exp) != len(got):
        fails.append((name, f'ROWS exp={len(exp)} got={len(got)}')); continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ok = True
    for c in exp.columns:
        a, b = exp[c], got[c]
        if a.dtype != b.dtype:
            try:
                b = b.astype(a.dtype)
            except Exception:
                fails.append((name, f'DTYPE {c}: exp {a.dtype} got {b.dtype}')); ok=False; break
        eq = (a.isna() & b.isna()) | (a == b)
        if not eq.all():
            i = (~eq).idxmax()
            fails.append((name, f'VAL {c} row{i}: exp={a[i]!r} got={b[i]!r}')); ok=False; break
    if ok:
        print(f'OK    {name} ({len(got)} rows)')
for n, msg in fails:
    print(f'FAIL  {n}: {msg}')
declared = len(set(oracle) | set(failed_q))
print(f'\n{declared-len(fails)}/{declared} oracle queries match')
