#!/bin/bash
# Pre-commit gate (VERDICT r2 item 1): the fast test tier, ~1-2 min on this
# host even under CPU contention from a live runbook. Catches import-level
# and core-math regressions before every commit; the full suite still runs
# before round-end snapshots.
#
# Usage: bash scripts/quick_check.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
python -m pytest -q -m quick "$@"
