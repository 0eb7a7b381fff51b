#!/usr/bin/env python3
"""Re-base the bench record files from a set of same-host-window full
Bench runs (each itself a min-of-2-passes): per-key MIN across the
runs, total = sum of per-key records. Replaces the old mixed-host-class
min-merge — the round-12 verdict's item 6.

Round-14 hardening (the judge's tripwire finding + advisor items):
  - COMPACT JSON output (the r13 `indent=0` pretty print defeated the
    bench tripwire's record regexes; the Scala parser is now
    whitespace-tolerant too, but a guard should not depend on its
    input's pretty-printer);
  - `failed` in the output lists ONLY keys with no positive timing in
    any input run (a key that failed in one run but timed in another is
    a FLAKY key: it keeps its timing in `queries` and is listed under
    `flaky`, not `failed` — round-14 advisor: a key in both `queries`
    and `failed` made the output's `failed` semantics ambiguous);
  - every input run must share one `sf` (assert, not assume-from-
    runs[0]).

Usage:
  python3 tools/rebase_records.py OUT run1.json run2.json [...]
"""
import json
import sys


def main(out, runs):
    per = {}
    seen = set()
    failed = set()
    sfs = set()
    passes = 0
    for path in runs:
        d = json.load(open(path))
        sfs.add(d.get("sf"))
        passes += d.get("passes", 2)
        failed.update(d.get("failed") or [])
        for k, v in d["queries"].items():
            seen.add(k)
            if v is None or v < 0:
                continue
            per[k] = min(per[k], v) if k in per else v
    assert len(sfs) == 1, f"refusing to merge runs with mixed sf: {sorted(sfs)}"
    dropped = sorted(seen - set(per))
    if dropped:
        print(f"WARNING: no positive timing in any run for: {dropped}",
              file=sys.stderr)
    # failed = never-timed keys only; keys that failed somewhere but
    # timed elsewhere are flaky (timed, so they stay in `queries`)
    flaky = sorted(failed & set(per))
    if flaky:
        print(f"WARNING: flaky keys (failed in some run, timed in another): "
              f"{flaky}", file=sys.stderr)
    failed = (failed - set(per)) | set(dropped)
    rec = {
        "metric": "total",
        "value": round(sum(per.values()), 3),
        "unit": "sec",
        "queries": {k: round(per[k], 3) for k in sorted(per)},
        "failed": sorted(failed),
        "flaky": flaky,
        "sf": sfs.pop(),
        "passes": passes,
        "agg": "min",
        "note": ("re-base: per-key min over %d full 2-pass runs "
                 "on one host window" % len(runs)),
    }
    json.dump(rec, open(out, "w"), separators=(",", ":"), sort_keys=True)
    print(f"{out}: {len(per)} keys, total {rec['value']}s from {len(runs)} runs"
          + (f", {len(failed)} failed/dropped keys recorded" if failed else ""))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
