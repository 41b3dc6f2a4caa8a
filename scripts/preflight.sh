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
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch Test/compile "Test/testOnly graft.SparkEntrySpec" 2>&1 | tail -20
echo "preflight OK: Test/compile green, driver contract + probe roster intact"
