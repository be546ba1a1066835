#!/usr/bin/env bash
# Dual-scale oracle gate: run the full Verify dump + DuckDB compare at BOTH
# sf0.01 (the driver's gate scale) and sf0.1 (the bench scale) so
# decimal/ordering parity regressions cannot hide at the small scale.
# Round hygiene: run once per round after the last query change
# (BENCH_NOTES records r2's one-off dual-scale pass; this scripts it).
#
# Usage: tools/dual_scale_gate.sh   [from the repo root or anywhere]
set -euo pipefail
cd "$(dirname "$0")/.."
for sf in sf0.01 sf0.1; do
  out="/tmp/graft_verify_$sf"
  rm -rf "$out"
  echo "== Verify $sf =="
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.Verify /root/testdata/$sf $out" 2>&1 \
    | grep '\[verify\]' || true   # per-query failures only; none = silent
  echo "== Compare $sf =="
  python3 tools/compare.py "/root/testdata/$sf" "$out" | tail -3
done
