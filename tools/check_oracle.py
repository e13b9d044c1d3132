#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

NOT part of the library (the engine is pure Scala/Spark): this script uses
the driver-side python stack (duckdb/pyarrow/pandas) to pre-check oracle
parity before the driver runs the real gate.

Usage:
  python3 tools/check_oracle.py [sfdir] [outdir]
Runs `sbt runMain graft.Verify` first unless outdir already has results and
--no-run is passed.
"""
import json
import math
import os
import re
import subprocess
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_ARG = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
# Verify redirects restricted dumps to their own directory (ADVICE r14)
# -- pass the raw dir through, READ from the suffixed one it writes
OUT = OUT_ARG
_only = os.environ.get("SPARK_GRAFT_ONLY")
if _only:
    # set() first: Verify.scala dedupes via toSet before sorting, so
    # SPARK_GRAFT_ONLY='q81,q81' must resolve to the same directory
    names = sorted(set(n.strip() for n in _only.split(",")))
    OUT = Path(str(OUT_ARG) + "_only_"
               + re.sub(r"[^A-Za-z0-9_]", "_", "_".join(names)))
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

if "--no-run" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT_ARG}'],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], r.stderr[-4000:])
        sys.exit(1)
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.loads((OUT / "oracle_sql.json").read_text())
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got_files = str(OUT / name / "*.parquet")
        got = con.sql(f"SELECT * FROM '{got_files}'").df()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        n_fail += 1
        continue
    # driver semantics: sort columns by name, then compare values
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        n_fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        n_fail += 1
        continue
    # sort rows by all columns for stability, then cell-compare
    def norm(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
        return df
    exp, got = norm(exp), norm(got)
    bad = None
    for c in exp.columns:
        for i, (a, b) in enumerate(zip(exp[c], got[c])):
            na, nb = pd.isna(a), pd.isna(b)
            if na and nb:
                continue
            if na != nb:
                bad = (c, i, a, b); break
            if isinstance(a, float) or isinstance(b, float):
                if not math.isclose(float(a), float(b), rel_tol=0, abs_tol=1e-9):
                    bad = (c, i, a, b); break
            elif str(a) != str(b):
                bad = (c, i, a, b); break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")
        n_pass += 1

# queries that produced output but have no oracle (driver will record a
# weaker rows-only check for these — list them so omissions are deliberate)
produced = {p.name for p in OUT.iterdir() if p.is_dir()}
missing = sorted(produced - set(oracle))
if missing:
    print(f"\nno oracle (rows-only check): {missing}")
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
