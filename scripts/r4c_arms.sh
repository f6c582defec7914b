#!/bin/bash
# ROUND 4c — the two quality arms still unevaluated after the r4 runbook
# (restarts, TTA: VERDICT r3 item 3) plus the fasterrcnn re-retrain with the
# warmup-cosine + grad-clip fix (item 4). Runs on a fresh VM: the workspace
# was re-bootstrapped (scripts/bootstrap_workspace.sh), so the first stage
# also regenerates the flagship CNN maps and re-warms the persistent XLA
# cache for the round-end bench.
#
# Same deadline discipline as r4_runbook.sh (ADVICE r3): R4C_HARD_END is
# REQUIRED, checked at start, and every stage gets a hard timeout to the
# deadline.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r4c_status.log

if [ -z "$R4C_HARD_END" ]; then
  echo "R4C ABORT: set R4C_HARD_END (epoch seconds) explicitly" | tee -a "$STATUS"
  exit 2
fi
if [ "$(stamp)" -ge "$R4C_HARD_END" ]; then
  echo "R4C ABORT: R4C_HARD_END ($R4C_HARD_END) is already in the past" | tee -a "$STATUS"
  exit 2
fi

run_stage() { # tag attempts args...
  local tag=$1 attempts=$2; shift 2
  local t=$(stamp)
  if [ "$t" -ge "$R4C_HARD_END" ]; then
    echo "R4C_${tag} SKIPPED (hard end)" >> "$STATUS"
    return
  fi
  local budget=$(( R4C_HARD_END - t ))
  local t0=$(stamp)
  timeout "$budget" python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r4c_${tag}.log" 2>&1
  echo "R4C_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
}

clone_model() { # src dst
  rm -rf "workspace/models_storage/$2"
  cp -r "workspace/models_storage/$1" "workspace/models_storage/$2"
  rm -f "workspace/models_storage/$2/config.json"
  echo "{\"copied_from\": \"$1\", \"note\": \"weights/calibration byte-copied by scripts/r4c_arms.sh; training history in log.json belongs to the source model\"}" \
    > "workspace/models_storage/$2/PROVENANCE.json"
}

MS=workspace/models_storage/mpp

# --- 1. restarts arm: best-of-4 annealing restarts on the dd flagship
# (regenerates the plain pos_r2cp/pos_r2/shape_r2cp val maps lost to the VM
# reset — shared with the flagship + bench signatures)
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  clone_model mpp/mpp_log_r10 mpp/mpp_log_r10rst
  run_stage R10_RST 6 -p infereval -m mpp -c mpp_log_r10rst -s val -o
fi

# --- 2. fasterrcnn re-retrain with the warmup-cosine + grad-clip fix
# (ahead of TTA: ~10 min train, and a non-zero fasterrcnn AP row is the
# last missing baseline-detector capability row)
run_stage FRCNN_TRAIN3 5 -p train -m fasterrcnn -c fasterrcnn_quick -o
run_stage FRCNN_INFER3 5 -p infereval -m fasterrcnn -c fasterrcnn_quick -s val -o

# --- 3. TTA arm: dihedral-TTA CNN maps (weight-copied *_tta model dirs
# restored from artifacts; ensure_cnn_inference regenerates their maps)
if [ -f "$MS/mpp_log_r10tta/energy_combination_model.json" ]; then
  run_stage R10_TTA 6 -p infereval -m mpp -c mpp_log_r10tta -s val -o
fi

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R4C_DONE >> "$STATUS"
