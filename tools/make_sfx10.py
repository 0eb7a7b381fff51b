#!/usr/bin/env python3
"""Replicate the sf0.1 tables tenfold for the scale sweep (the recipe
behind SCALING.md "Round 5: x10 full-registry scale run").

FK-preserving: dimensions (region, nation, customer, supplier, part)
ship verbatim; fact tables get 10 copies with a consistent 10^7 id
offset per copy on their OWN keys only, so every foreign key still
resolves and per-entity row counts grow 10x:
  - orders.o_orderkey        += j*10^7   (o_custkey verbatim)
  - lineitem.l_orderkey      += j*10^7   (part/supp keys verbatim)
  - events.event_id, user_id += j*10^7   (10x users, same horizon)
  - documents.doc_id         += j*10^7   (dedup twins at +10^6 stay clear)
  - embeddings.vec_id        += j*10^7   (ids < cells/k stay the seeds)

Usage: python3 tools/make_sfx10.py [srcDir] [dstDir]
"""
import os
import sys

import duckdb

OFF = 10_000_000


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part"]:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    facts = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t, keys in facts.items():
        repl = ", ".join(f"{k} + j.j * {OFF} AS {k}" for k in keys)
        con.sql(
            f"COPY (SELECT * REPLACE ({repl}) FROM '{src}/{t}.parquet', range(10) j(j)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(t, con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0])


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
    main(src, dst)
