#!/usr/bin/env python3
"""Per-key scaling ratios between two BENCH_FULL.json dumps (e.g. sf0.1
vs the 10x-replicated set). Linear scaling on a fixed 32-core host is a
ratio <= the data growth factor; overhead-dominated keys sit well below
it. Keys above `flag` (default: growthx1.5) are printed as suspects —
exclude the documented quadratic-by-contract operators when reading.

Usage: python3 tools/scale_ratio.py <base.json> <scaled.json> [growth]
"""
import json
import sys


def main(base_path, scaled_path, growth):
    base = json.load(open(base_path))["queries"]
    scaled = json.load(open(scaled_path))["queries"]
    flag = growth * 1.5
    rows = []
    for k, v in scaled.items():
        b = base.get(k)
        if b and b > 0:
            rows.append((v / b, b, v, k))
    rows.sort(reverse=True)
    print(f"{'ratio':>7} {'base':>8} {'scaled':>8}  key")
    for r, b, v, k in rows:
        mark = " <-- SUPER-LINEAR" if r > flag and v > 1.0 else ""
        print(f"{r:7.1f} {b:8.2f} {v:8.2f}  {k}{mark}")
    tot_b = sum(b for _, b, _, _ in rows)
    tot_v = sum(v for _, _, v, _ in rows)
    print(f"\ntotal {tot_b:.1f}s -> {tot_v:.1f}s ({tot_v / tot_b:.1f}x at {growth:.0f}x data)")


if __name__ == "__main__":
    g = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(sys.argv[1], sys.argv[2], g)
