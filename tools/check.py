#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads <out>/oracle_sql.json, runs each SQL in DuckDB against the parquet
tables in sfDir, and compares to the parquet the Spark side dumped at
<out>/<name>/. Reports schema/rowcount/value mismatches; floats are compared
both bit-exact and with tolerance so near-misses are visible.
"""
import duckdb, sys, json, glob, os
import pandas as pd
import numpy as np

# flags are consumed BEFORE positionals so "--json" can never be swallowed
# as the sf/out dir, and a missing path after it fails loudly up front
# (not with an IndexError after the whole gate already ran)
args = sys.argv[1:]
record_path = None
if "--json" in args:
    i = args.index("--json")
    if i + 1 >= len(args):
        sys.exit("check.py: --json requires a path argument")
    record_path = args[i + 1]
    del args[i : i + 2]
sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out = args[1] if len(args) > 1 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
n_pass = 0
fails = []


def norm(df):
    cols = sorted(df.columns)
    df = df[cols]
    # canonicalize dtypes for compare
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)


for name in sorted(oracle):
    sql = oracle[name]
    res_dir = f"{out}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        s = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    except Exception as e:
        fails.append((name, f"spark read: {e}"))
        continue
    try:
        d = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"duckdb: {str(e).splitlines()[0]}"))
        continue
    if sorted(s.columns) != sorted(d.columns):
        fails.append((name, f"schema: spark={sorted(s.columns)} duck={sorted(d.columns)}"))
        continue
    if len(s) != len(d):
        fails.append((name, f"rowcount: spark={len(s)} duck={len(d)}"))
        continue
    s, d = norm(s), norm(d)
    bad = []
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
            a = a.astype(float); b = b.astype(float)
            # byte-level equality (the driver hashes bytes): catches -0.0 vs
            # +0.0, which numeric compares treat as equal
            exact = np.array_equal(a, b, equal_nan=True) and np.array_equal(
                np.signbit(a), np.signbit(b))
            if not exact and np.array_equal(a, b, equal_nan=True):
                i = int(np.argmax(np.signbit(a) != np.signbit(b)))
                bad.append(f"{c}(signed-zero mismatch e.g. [{i}] {a[i]!r} vs {b[i]!r})")
            elif not exact:
                close = np.allclose(a, b, rtol=1e-8, atol=1e-10, equal_nan=True)
                i = int(np.argmax(~(np.isclose(a, b, rtol=0, atol=0) | (np.isnan(a) & np.isnan(b)))))
                bad.append(f"{c}(float exact=F close={close} e.g. [{i}] {a[i]!r} vs {b[i]!r})")
        else:
            if not np.array_equal(a, b):
                i = int(np.argmax(a != b))
                bad.append(f"{c}(e.g. [{i}] {a[i]!r} vs {b[i]!r})")
    # surface dtype skew (int32 vs int64 etc.) — values may match but a
    # stricter driver-side schema check could still fail
    dt = [
        f"{c}({s[c].dtype}!={d[c].dtype})"
        for c in s.columns
        if str(s[c].dtype) != str(d[c].dtype)
        and not (np.issubdtype(s[c].dtype, np.floating) and np.issubdtype(d[c].dtype, np.floating))
    ]
    if bad:
        fails.append((name, "; ".join(bad)))
    else:
        n_pass += 1
        note = f"  [dtype skew: {', '.join(dt)}]" if dt else ""
        print(f"PASS {name} ({len(s)} rows){note}")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{n_pass}/{len(oracle)} pass")
if record_path:
    failed = {n: m for n, m in fails}
    rec = {
        "metric": "oracle_gate",
        "sf": sf,
        "out": out,
        "master": os.environ.get("SPARK_GRAFT_MASTER", "local[N]"),
        "n_pass": n_pass,
        "n_total": len(oracle),
        "failures": failed,
    }
    with open(record_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(f"record -> {record_path}")
sys.exit(1 if fails else 0)
