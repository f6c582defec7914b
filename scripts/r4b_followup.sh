#!/bin/bash
# ROUND 4 follow-up — runs after scripts/r4_runbook.sh writes R4_DONE.
#
# Stages (value order):
#   1. mpp_log_r10sw  — switched-superstep flagship arm: AP must hold vs
#                       mpp_log_r10dd for superstep_move_switch to become the
#                       product default (VERDICT r3 item 1b: product-path perf)
#   2. fasterrcnn retrain — with the warmup-cosine + grad-clip fix for the
#                       constant-score collapse post-mortemed this round
#
# Same deadline discipline as r4_runbook.sh: R4_HARD_END required, per-stage
# timeout to the deadline.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r4_status.log

if [ -z "$R4_HARD_END" ]; then
  echo "R4B ABORT: set R4_HARD_END (epoch seconds) explicitly" | tee -a "$STATUS"
  exit 2
fi

# wait for the main runbook to finish (it owns the device-stage sequencing)
while ! grep -q R4_DONE "$STATUS" 2>/dev/null; do
  if [ "$(stamp)" -ge "$R4_HARD_END" ]; then
    echo "R4B ABORT: hard end reached while waiting for R4_DONE" >> "$STATUS"
    exit 0
  fi
  sleep 30
done

run_stage() { # tag attempts args...
  local tag=$1 attempts=$2; shift 2
  local t=$(stamp)
  if [ "$t" -ge "$R4_HARD_END" ]; then
    echo "R4B_${tag} SKIPPED (hard end)" >> "$STATUS"
    return
  fi
  local budget=$(( R4_HARD_END - t ))
  local t0=$(stamp)
  timeout "$budget" python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r4b_${tag}.log" 2>&1
  echo "R4B_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
}

clone_model() { # src dst
  rm -rf "workspace/models_storage/$2"
  cp -r "workspace/models_storage/$1" "workspace/models_storage/$2"
  rm -f "workspace/models_storage/$2/config.json"
  echo "{\"copied_from\": \"$1\", \"note\": \"weights/calibration byte-copied by scripts/r4b_followup.sh; training history in log.json belongs to the source model\"}" \
    > "workspace/models_storage/$2/PROVENANCE.json"
}

MS=workspace/models_storage/mpp

# --- 1. switched-superstep flagship arm: DROPPED. The perf A/B
# (scripts/superstep_ab.py, 2026-08-20) measured the switched superstep at
# ~9.3 ms/superstep vs ~6-7.5 ms for the per-cell variant at flagship scale
# — lax.switch adds overhead instead of cutting dispatch, so the switch
# stays a non-default option and the arm isn't worth device time.

# --- 2. fasterrcnn retrain with the stabilized schedule
run_stage FRCNN_TRAIN3 4 -p train -m fasterrcnn -c fasterrcnn_quick -o
run_stage FRCNN_INFER3 4 -p infereval -m fasterrcnn -c fasterrcnn_quick -s val -o

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R4B_DONE >> "$STATUS"
