#!/bin/bash
# ROUND 5 final phase: MPP calibration + energy weights trained ON the
# TTA+LS maps (fixes the stale-calibration issue the parity probe exposed),
# then extensions + parity inferevals. Requires R5F_HARD_END.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r5_status.log
if [ -z "$R5F_HARD_END" ]; then echo "R5F ABORT: set R5F_HARD_END" | tee -a "$STATUS"; exit 2; fi

run_stage() { # tag attempts args...
  local tag=$1 attempts=$2; shift 2
  local t=$(stamp)
  if [ "$t" -ge "$R5F_HARD_END" ]; then
    echo "R5F_${tag} SKIPPED (hard end)" >> "$STATUS"; return
  fi
  local t0=$(stamp)
  timeout -k 60 $(( R5F_HARD_END - t )) python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r5f_${tag}.log" 2>&1
  echo "R5F_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
}

run_stage R12_TRAIN 4 -p train -m mpp -c mpp_log_r12tta -o
run_stage R12_INFER 4 -p infereval -m mpp -c mpp_log_r12tta -s val -o

if [ -f workspace/models_storage/mpp/mpp_log_r12tta/energy_combination_model.json ]; then
  rm -rf workspace/models_storage/mpp/mpp_log_r12ttapar
  cp -r workspace/models_storage/mpp/mpp_log_r12tta workspace/models_storage/mpp/mpp_log_r12ttapar
  rm -f workspace/models_storage/mpp/mpp_log_r12ttapar/config.json
  cp model_configs/mpp/mpp_log_r12ttapar.json workspace/models_storage/mpp/mpp_log_r12ttapar/config.json
  echo '{"copied_from": "mpp/mpp_log_r12tta", "note": "weights/calibration byte-copied by scripts/r5f_arms.sh"}' \
    > workspace/models_storage/mpp/mpp_log_r12ttapar/PROVENANCE.json
  run_stage R12_PAR 4 -p infereval -m mpp -c mpp_log_r12ttapar -s val -o
fi

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R5F_DONE >> "$STATUS"
