#!/usr/bin/env python3
"""Empirical scaling curve: per-query time ratio between two bench runs.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> [factor]

Each input is a graft.Bench full-result JSON (bench_result.json). Prints a
markdown table sorted by ratio (descending) and flags super-linear
outliers: with a data-size `factor` between the runs (default 10 for
sf0.01 -> sf0.1), a ratio materially above `factor` means the query's cost
grew faster than its input. Sub-second small-side times are noted — their
ratios are dominated by fixed job-scheduling overhead, not data.
"""
import json, sys

def main(small_path, big_path, factor=10.0):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    qs, qb = small["queries"], big["queries"]
    shared = sorted(set(qs) & set(qb))
    rows = []
    for name in shared:
        ts, tb = qs[name], qb[name]
        if ts <= 0 or tb <= 0:
            continue  # failed on one side; the correctness gate owns that
        noisy = (name in small.get("noise_suspect", []) or
                 name in big.get("noise_suspect", []))
        rows.append((tb / ts, ts, tb, name, noisy))
    rows.sort(reverse=True)
    print(f"| query | {small.get('sf','small')} s | "
          f"{big.get('sf','big')} s | ratio | note |")
    print("|---|---|---|---|---|")
    flagged = []
    for ratio, ts, tb, name, noisy in rows:
        notes = []
        if noisy:
            notes.append("noise-suspect")
        if ts < 0.15:
            notes.append("overhead-bound")
        if ratio > 1.2 * factor and not noisy and ts >= 0.15:
            notes.append(f"SUPER-LINEAR (> {factor:.0f}x data)")
            flagged.append(name)
        print(f"| {name} | {ts:.3f} | {tb:.3f} | {ratio:.1f}x |"
              f" {', '.join(notes)} |")
    print()
    tot_s = sum(t for _, t, _, _, _ in rows)
    tot_b = sum(t for _, _, t, _, _ in rows)
    print(f"Totals: {tot_s:.1f} s -> {tot_b:.1f} s "
          f"({tot_b / tot_s:.1f}x on {factor:.0f}x data)")
    if flagged:
        print(f"SUPER-LINEAR QUERIES: {', '.join(flagged)}")
    return flagged

if __name__ == "__main__":
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    main(sys.argv[1], sys.argv[2], factor)
