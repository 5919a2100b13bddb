#!/bin/bash
# Round-close gate runner — the full end-of-round standard in one
# sequential script, so no matrix can be silently skipped (the r19
# verdict's item 8, adopted). Ordering is load-bearing:
#   - the timed stages (bench, speedup) run with NOTHING else on the
#     host;
#   - Verify-based tools never overlap (each run exports oracle aux to
#     the fixed /tmp/graft_oracle_aux at its end, and the determinism
#     checker owns the fixed /tmp/graft_det_a|b pair).
#
# Usage:  tools/round_close.sh <round-number>
# Writes: /tmp/round_close_r<N>/ (logs), DETERMINISM_r<N>.txt is
# assembled by hand from the determinism logs (the one narrative
# artifact), SPEEDUP_r<N>.json is written by SpeedupGateSpec itself.
set -u
N="${1:?usage: tools/round_close.sh <round-number>}"
OUT="/tmp/round_close_r${N}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step "0/6 source hygiene: no binary-detected (raw control byte) files"
BIN=$(( $(find src tools -name '*.scala' -o -name '*.py' -o -name '*.sh' \
  | wc -l) - $(grep -rlI . src tools --include='*.scala' --include='*.py' \
  --include='*.sh' | wc -l) ))
if [ "$BIN" -ne 0 ]; then
  echo "FAIL: $BIN source file(s) grep as binary — escape raw control" \
    "bytes (\\u wrote the r20 Lossy.scala NUL; see VERDICT r20 #2/#7)"
  exit 1
fi
echo "ok: all source files grep as text"

step "1/6 full test suite"
sbt -batch test > "$OUT/test.log" 2>&1
grep -E "Tests: |All tests passed|TESTS FAILED" "$OUT/test.log" | tail -3

step "2/6 correctness gate (sf0.01 oracle compare)"
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/graft_verify \
  > "$OUT/oracle.log" 2>&1
tail -2 "$OUT/oracle.log"

step "3/6 determinism: sf0.001 3v16, sf0.001 1v32, sf1 3v16"
python3 tools/check_determinism.py /root/testdata/sf0.001 \
  > "$OUT/det_small_3v16.log" 2>&1
tail -1 "$OUT/det_small_3v16.log"
GRAFT_DET_CPUS=1,32 python3 tools/check_determinism.py \
  /root/testdata/sf0.001 > "$OUT/det_small_1v32.log" 2>&1
tail -1 "$OUT/det_small_1v32.log"
python3 tools/check_determinism.py /root/repo/data/sf1 \
  > "$OUT/det_sf1_3v16.log" 2>&1
tail -1 "$OUT/det_sf1_3v16.log"

step "4/6 full bench, sf0.1 (QUIET HOST — timed)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > "$OUT/bench_sf01.log" 2>&1
grep '"metric"' "$OUT/bench_sf01.log" | tail -1

step "5/6 speedup gate (QUIET HOST — timed)"
sbt -batch "testOnly graft.SpeedupGateSpec" > "$OUT/speedup.log" 2>&1
grep -E "Tests: |speedup" "$OUT/speedup.log" | tail -3

step "6/6 plan census regen (PLANS.md)"
sbt -batch "runMain graft.Plans /root/testdata/sf0.1" \
  > "$OUT/plans.log" 2>&1
tail -2 "$OUT/plans.log"

step "done — logs in $OUT"
