#!/bin/bash
# ROUND 4 runbook — the queued evaluation arms plus the data-driven-superstep
# A/B (VERDICT r3 items 2, 3, 4).
#
# Stages in value order:
#   1. mpp_log_r10dd    — flagship A/B: r10 weights + data-driven superstep
#                         moves (compare against the recorded r10 metrics)
#   2. mpp_log_r10ddpar — parity scoring (extensions off) on the same arm
#   3. fasterrcnn_quick — retrain with the r3c tiny-object fixes + infereval
#   4. bbavec/oracle    — re-export against the sub-pixel GT
#   5. mpp_log_r10pol   — gradient-polish arm (queued since r3)
#   6. mpp_log_r10tta   — dihedral-TTA arm (queued since r3)
#   7. mpp_log_r10rst   — best-of-4 restarts arm
#
# ADVICE r3 fixes: R4_HARD_END is REQUIRED and checked against now at start
# (no silent all-SKIP runs); each stage also gets a hard `timeout` to the
# deadline so a stage started late cannot overrun the round-end bench window.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r4_status.log

if [ -z "$R4_HARD_END" ]; then
  echo "R4_RUNBOOK ABORT: set R4_HARD_END (epoch seconds) explicitly" | tee -a "$STATUS"
  exit 2
fi
if [ "$(stamp)" -ge "$R4_HARD_END" ]; then
  echo "R4_RUNBOOK ABORT: R4_HARD_END ($R4_HARD_END) is already in the past" | tee -a "$STATUS"
  exit 2
fi

run_stage() { # tag attempts args...
  local tag=$1 attempts=$2; shift 2
  local t=$(stamp)
  if [ "$t" -ge "$R4_HARD_END" ]; then
    echo "R4_${tag} SKIPPED (hard end)" >> "$STATUS"
    return
  fi
  local budget=$(( R4_HARD_END - t ))
  local t0=$(stamp)
  timeout "$budget" python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r4_${tag}.log" 2>&1
  echo "R4_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
}

clone_model() { # src dst
  rm -rf "workspace/models_storage/$2"
  cp -r "workspace/models_storage/$1" "workspace/models_storage/$2"
  rm -f "workspace/models_storage/$2/config.json"
  # provenance: the trained artifacts are byte-copies of $1 (ADVICE r3)
  echo "{\"copied_from\": \"$1\", \"note\": \"weights/calibration byte-copied by scripts/r4_runbook.sh; training history in log.json belongs to the source model\"}" \
    > "workspace/models_storage/$2/PROVENANCE.json"
}

MS=workspace/models_storage/mpp

# --- 1+2. data-driven superstep A/B on the trained r10 combinator
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  clone_model mpp/mpp_log_r10 mpp/mpp_log_r10dd
  run_stage R10_DD 8 -p infereval -m mpp -c mpp_log_r10dd -s val -o
  clone_model mpp/mpp_log_r10 mpp/mpp_log_r10ddpar
  run_stage R10_DDPAR 6 -p infereval -m mpp -c mpp_log_r10ddpar -s val -o
fi

# --- 3. fasterrcnn retrain (r3c post-mortem fixes live in the config)
run_stage FRCNN_TRAIN2 5 -p train -m fasterrcnn -c fasterrcnn_quick -o
run_stage FRCNN_INFER2 5 -p infereval -m fasterrcnn -c fasterrcnn_quick -s val -o

# --- 4. re-export rows that predate the sub-pixel GT fix
run_stage BBAVEC_INFER3 5 -p infereval -m bbavec -c bbavec_quick -s val -o
run_stage ORACLE2 3 -p infereval -m oracle -c config_oracle -s val -o

# --- 5. polish arm
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  clone_model mpp/mpp_log_r10 mpp/mpp_log_r10pol
  run_stage R10_POLISH 5 -p infereval -m mpp -c mpp_log_r10pol -s val -o
fi

# --- 6. TTA arm: weight-copied CNNs regenerate dihedral-TTA maps
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  clone_model posnet/pos_r2cp posnet/pos_r2cp_tta
  clone_model posnet/pos_r2 posnet/pos_r2_tta
  clone_model shapenet/shape_r2cp shapenet/shape_r2cp_tta
  clone_model mpp/mpp_log_r10 mpp/mpp_log_r10tta
  run_stage R10_TTA 5 -p infereval -m mpp -c mpp_log_r10tta -s val -o
fi

# --- 7. restarts arm
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  clone_model mpp/mpp_log_r10 mpp/mpp_log_r10rst
  run_stage R10_RST 5 -p infereval -m mpp -c mpp_log_r10rst -s val -o
fi

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R4_DONE >> "$STATUS"
