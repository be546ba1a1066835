#!/usr/bin/env bash
# Dual-scale oracle gate: run the full Verify dump + DuckDB compare at BOTH
# sf0.01 (the driver's gate scale) and sf0.1 (the bench scale) so
# decimal/ordering parity regressions cannot hide at the small scale.
# Round hygiene: run once per round after the last query change.
#
# Exit status is the gate: nonzero if Verify fails to run, any query
# fails to dump, any compare line FAILs, or the match count is not N/N.
#
# Usage: tools/dual_scale_gate.sh   [from the repo root or anywhere]
set -uo pipefail
cd "$(dirname "$0")/.."
fail=0
for sf in sf0.01 sf0.1; do
  out="/tmp/graft_verify_$sf"
  log="$out.log"
  rm -rf "$out"
  echo "== Verify $sf =="
  if ! SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
      sbt -batch "runMain graft.Verify /root/testdata/$sf $out" \
      > "$log" 2>&1; then
    echo "Verify $sf: sbt run FAILED (tail of $log):"
    tail -5 "$log"
    fail=1
    continue
  fi
  if grep '\[verify\]' "$log"; then
    echo "Verify $sf: per-query dump failures above"
    fail=1
  fi
  echo "== Compare $sf =="
  cmp_out="$(python3 tools/compare.py "/root/testdata/$sf" "$out")" || fail=1
  echo "$cmp_out" | grep -E "^FAIL" && fail=1
  echo "$cmp_out" | tail -1
  # require N/N: the summary line must have matched == total
  if ! echo "$cmp_out" | awk '/oracle queries match/ {
        split($1, a, "/"); ok = (a[1] == a[2] && a[2] > 0) }
      END { exit ok ? 0 : 1 }'; then
    echo "Compare $sf: NOT all queries match"
    fail=1
  fi
done
exit $fail
