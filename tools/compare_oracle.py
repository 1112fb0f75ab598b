#!/usr/bin/env python3
"""Dev-only harness twin: compare Verify output parquet against the DuckDB
oracles, emulating the driver's t2 check (sort columns by name, compare
row multisets exactly). Not part of the engine — the Scala library has no
Python dependency."""
import json, sys, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        # Read the Spark side the way the DRIVER does — pyarrow → pandas,
        # datetime64[ns] coercion and all — so an ns-unrepresentable value
        # (e.g. a year-9999 sentinel, round-10's q192 red) fails HERE, not
        # only at the driver. DuckDB read would mask the coercion.
        got = pd.concat(
            [pq.read_table(f).to_pandas() for f in sorted(files)],
            ignore_index=True) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        exp = con.sql(oracle[name]).df()
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        status, detail = "PASS", ""
        if list(got.columns) != list(exp.columns):
            status, detail = "FAIL", f"schema {list(got.columns)} vs {list(exp.columns)}"
        elif len(got) != len(exp):
            status, detail = "FAIL", f"rows {len(got)} vs {len(exp)}"
        else:
            g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            g = g.astype(str)  # hash-style exact compare on canonical repr
            e = e.astype(str)
            if not g.equals(e):
                diff = (g != e).any(axis=1)
                idx = diff[diff].index[:3]
                detail = "values differ, e.g.\n" + "\n".join(
                    f"    got {g.loc[i].to_dict()}\n    exp {e.loc[i].to_dict()}" for i in idx)
                status = "FAIL"
        print(f"  [{status}] {name} ({len(got)} rows) {detail}")
        n_pass += status == "PASS"; n_fail += status == "FAIL"
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
