#!/usr/bin/env python3
"""Scaled-up correctness gate: same compare as verify_local.py, but each
key runs in its own subprocess with a wall-clock budget, because at 10x
data some ORACLES are intentionally quadratic (all-pairs ground truth for
the LSH/ANN keys) and would take hours in DuckDB even though the engine
side finished in seconds. A key whose oracle exceeds the budget reports
ORACLE_TIMEOUT — its correctness stays pinned by the sf0.01/sf0.1 gate;
the scaled run still checks the engine side ran and the tractable-oracle
majority still gets the full value compare.

Usage: python3 tools/verify_scaled.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import glob
import json
import multiprocessing as mp
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)


def check_one(sf_dir, out_dir, name, sql, q):
    import duckdb
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table directory (ScaleUp)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        want = norm(con.sql(sql).df())
    except Exception as e:
        q.put(("ERR ", f"{e}"))
        return
    if list(got.columns) != list(want.columns):
        q.put(("COLS", f"got {list(got.columns)} want {list(want.columns)}"))
        return
    if len(got) != len(want):
        q.put(("ROWS", f"got {len(got)} want {len(want)}"))
        return
    dt_bad = [c for c in got.columns
              if got[c].dtype.kind != want[c].dtype.kind
              and {got[c].dtype.kind, want[c].dtype.kind} & {"i", "u", "f"}]
    if dt_bad:
        q.put(("DTYP", str({c: f"{got[c].dtype}!={want[c].dtype}" for c in dt_bad})))
        return
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        q.put(("OK", f"{len(got)} rows"))
    except AssertionError as e:
        q.put(("HASH", str(e).splitlines()[-1][:200]))


def main(sf_dir, out_dir, timeout):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_timeout = 0
    timeouts = []
    for name, sql in sorted(oracles.items()):
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            print(f"[MISS] {name}: no engine output", flush=True)
            n_bad += 1
            continue
        q = mp.Queue()
        p = mp.Process(target=check_one, args=(sf_dir, out_dir, name, sql, q))
        p.start()
        p.join(timeout)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"[TIME] {name}: oracle exceeded {timeout}s", flush=True)
            n_timeout += 1
            timeouts.append(name)
            continue
        status, msg = q.get() if not q.empty() else ("ERR ", "worker died")
        print(f"[{status:4}] {name}: {msg}", flush=True)
        if status == "OK":
            n_ok += 1
        else:
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {n_timeout} oracle-timeout")
    if timeouts:
        print("oracle-timeout keys:", ",".join(timeouts))
    return 1 if n_bad else 0


if __name__ == "__main__":
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 180
    sys.exit(main(sys.argv[1], sys.argv[2], t))
