#!/bin/bash
# ROUND 5 phase-1 device arms (VERDICT r4 items 3 + 4):
#   1. fasterrcnn retrain with the warmup-cosine + grad-clip fix (slipped
#      two rounds; ~12 min) + infereval -> first non-trivial AP row
#   2. TTA arm infereval (mpp_log_r10tta config.json restored this round;
#      dihedral-TTA CNN maps on the 256-epoch weights) -> measure-or-retire
#
# Deadline discipline as r4c_arms.sh: R5_HARD_END (epoch seconds) REQUIRED,
# per-stage timeout to the deadline, snapshot after every stage.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r5_status.log

if [ -z "$R5_HARD_END" ]; then
  echo "R5 ABORT: set R5_HARD_END (epoch seconds) explicitly" | tee -a "$STATUS"
  exit 2
fi
if [ "$(stamp)" -ge "$R5_HARD_END" ]; then
  echo "R5 ABORT: R5_HARD_END ($R5_HARD_END) is already in the past" | tee -a "$STATUS"
  exit 2
fi

run_stage() { # tag attempts args...
  local tag=$1 attempts=$2; shift 2
  local t=$(stamp)
  if [ "$t" -ge "$R5_HARD_END" ]; then
    echo "R5_${tag} SKIPPED (hard end)" >> "$STATUS"
    return
  fi
  local budget=$(( R5_HARD_END - t ))
  local t0=$(stamp)
  timeout -k 60 "$budget" python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r5_${tag}.log" 2>&1
  echo "R5_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
}

# --- 1. fasterrcnn re-retrain (warmup-cosine + grad-clip already in code)
run_stage FRCNN_TRAIN 5 -p train -m fasterrcnn -c fasterrcnn_quick -o
run_stage FRCNN_INFER 5 -p infereval -m fasterrcnn -c fasterrcnn_quick -s val -o

# --- 2. TTA arm (the last queued-but-never-run quality lever)
run_stage R10_TTA 6 -p infereval -m mpp -c mpp_log_r10tta -s val -o

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R5_DONE >> "$STATUS"
