#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB against the sf parquet tables and compare
with the engine's parquet dumps (written by `sbt "runMain graft.Verify"`).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table directory (ScaleUp/OrganicGen)
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no engine output")
            n_bad += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: got {list(got.columns)} want {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: got {len(got)} want {len(want)}")
            n_bad += 1
            continue
        # Mirror the driver's hash compare, which is dtype-sensitive: an
        # uncast DuckDB sum(BIGINT) comes back HUGEINT -> float64 and fails
        # the driver even when values are equal. Flag any numeric-kind drift.
        dt_bad = [c for c in got.columns
                  if got[c].dtype.kind != want[c].dtype.kind
                  and {got[c].dtype.kind, want[c].dtype.kind} & {"i", "u", "f"}]
        if dt_bad:
            kinds = {c: f"{got[c].dtype}!={want[c].dtype}" for c in dt_bad}
            print(f"[DTYP] {name}: {kinds}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            print(f"[ OK ] {name}: {len(got)} rows")
            n_ok += 1
        except AssertionError as e:
            print(f"[HASH] {name}: {str(e).splitlines()[-1][:200]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
