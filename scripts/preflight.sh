#!/usr/bin/env bash
# Preflight gate — run before ANY snapshot/bench/end-of-round commit.
#
# Exists because of the r9 damage mode: the end-of-round snapshot commit
# captured a half-reverted working tree (main sources rolled back, specs
# and probe roster kept), leaving HEAD with a dead test suite and a
# ScaleProbe that crashed on its own roster. This gate makes that state
# loud BEFORE the commit:
#   (a) sbt Test/compile — main + every spec must compile;
#   (b) graft.SparkEntrySpec — the driver-contract checks, including the
#       probe-roster rot-check ("ScaleProbe roster names only registered
#       gates"): a roster entry whose gate is de-registered fails here
#       with the gate's NAME.
# A deliberately-dangling roster entry (e.g. add "q999_nope" to
# ScaleProbe.DefaultProbes) fails step (b) — that is the self-test.
#   (c) the full gate suite executed + oracle-checked at sf0.001 — the
#       tri-SF sweep found two real bugs in r12 (gates green at sf0.01
#       but broken at the tiny SF's edge shapes: empty groups, single-
#       row lists), so the cheapest SF is structural, not optional.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch Test/compile "Test/testOnly graft.SparkEntrySpec" 2>&1 | tail -20
OUT=$(mktemp -d /tmp/preflight_sf0001.XXXX)
LOG=$(mktemp /tmp/preflight_verify.XXXX.log)
trap 'rm -rf "$OUT" "$LOG"' EXIT
# run_verify's own exit status must surface directly — an sbt/JVM crash
# is a preflight failure in its own right, not a downstream check.py
# FileNotFoundError pointing at the wrong culprit
if ! scripts/run_verify.sh /root/testdata/sf0.001 "$OUT" > "$LOG" 2>&1; then
  echo "preflight FAILED: run_verify.sh exited non-zero"; tail -20 "$LOG"; exit 1
fi
if grep -E "\[verify\].*failed" "$LOG"; then
  echo "preflight FAILED: gate threw at sf0.001 (see above)"; exit 1
fi
python3 scripts/check.py /root/testdata/sf0.001 "$OUT" \
  | grep -E "^!!|/.* pass" # mismatch lines + the N/N tally (pipefail aborts on a miss)
#   (d) the correctness-artifact roster tripwire (r16 verdict #2): the
#       newest non-adjudicated CORRECTNESS_r*.json must cover the gate
#       roster the current tree just ran — an empty/truncated driver
#       artifact (the r16 `{}` damage mode) fails HERE instead of
#       waiting for a judge to open a 2-byte file. Selftest first:
#       prove the checker itself still fails on `{}`.
python3 scripts/roster_check.py --selftest
python3 scripts/roster_check.py . "$OUT"
echo "preflight OK: Test/compile green, driver contract + probe roster intact, sf0.001 sweep green, correctness-artifact roster tripwire armed"
