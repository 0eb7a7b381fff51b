#!/usr/bin/env python3
"""Re-base the bench record files from a set of same-host-window full
Bench runs (each itself a min-of-2-passes): per-key MIN across the
runs, total = sum of per-key records. Replaces the old mixed-host-class
min-merge — the round-12 verdict's item 6.

Usage:
  python3 tools/rebase_records.py OUT run1.json run2.json [...]
"""
import json
import sys


def main(out, runs):
    per = {}
    for path in runs:
        d = json.load(open(path))
        for k, v in d["queries"].items():
            if v is None or v < 0:
                continue
            per[k] = min(per[k], v) if k in per else v
    base = json.load(open(runs[0]))
    rec = {
        "metric": "total",
        "value": round(sum(per.values()), 3),
        "unit": "sec",
        "queries": {k: round(per[k], 3) for k in sorted(per)},
        "failed": [],
        "sf": base.get("sf"),
        "passes": 2 * len(runs),
        "agg": "min",
        "note": ("round-13 re-base: per-key min over %d full 2-pass runs "
                 "on one host window, 2026-08-16" % len(runs)),
    }
    json.dump(rec, open(out, "w"), indent=0, sort_keys=True)
    print(f"{out}: {len(per)} keys, total {rec['value']}s from {len(runs)} runs")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
