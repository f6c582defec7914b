#!/bin/bash
# ROUND 5 phase-4: stacked arms after R5C_DONE, value order:
#   1. R11_LSTTA — LS shapenet + dihedral TTA (combines the two measured
#      winners: TTA +0.16 SV@0.50, LS +0.037 at half epochs)
#   2. R10_TTASM — TTA flagship + superstep split/merge (time-permitting)
# Requires R5D_HARD_END.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r5_status.log
if [ -z "$R5D_HARD_END" ]; then echo "R5D ABORT: set R5D_HARD_END" | tee -a "$STATUS"; exit 2; fi
while ! grep -q R5C_DONE "$STATUS" 2>/dev/null; do
  if [ "$(stamp)" -ge "$R5D_HARD_END" ]; then echo "R5D ABORT: hard end waiting for R5C_DONE" >> "$STATUS"; exit 0; fi
  sleep 30
done

run_stage() { # tag attempts min_secs args...
  local tag=$1 attempts=$2 need=$3; shift 3
  local t=$(stamp)
  if [ $(( R5D_HARD_END - t )) -lt "$need" ]; then
    echo "R5D_${tag} SKIPPED (insufficient time)" >> "$STATUS"; return
  fi
  local t0=$(stamp)
  timeout -k 60 $(( R5D_HARD_END - t )) python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r5d_${tag}.log" 2>&1
  echo "R5D_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
}

clone_model() { # src dst
  rm -rf "workspace/models_storage/$2"
  cp -r "workspace/models_storage/$1" "workspace/models_storage/$2"
  rm -f "workspace/models_storage/$2/config.json"
  echo "{\"copied_from\": \"$1\", \"note\": \"weights/calibration byte-copied by scripts/r5d_arms.sh\"}" \
    > "workspace/models_storage/$2/PROVENANCE.json"
}

# --- 1. LS + TTA stacked arm
clone_model shapenet/shape_r5ls shapenet/shape_r5ls_tta
cp model_configs/shapenet/shape_r5ls_tta.json \
   workspace/models_storage/shapenet/shape_r5ls_tta/config.json
clone_model mpp/mpp_log_r10tta mpp/mpp_log_r11lstta
cp model_configs/mpp/mpp_log_r11lstta.json \
   workspace/models_storage/mpp/mpp_log_r11lstta/config.json
run_stage R11_LSTTA 5 2100 -p infereval -m mpp -c mpp_log_r11lstta -s val -o

# --- 2. TTA + split/merge (time-permitting)
clone_model mpp/mpp_log_r10tta mpp/mpp_log_r10ttasm
cp model_configs/mpp/mpp_log_r10ttasm.json \
   workspace/models_storage/mpp/mpp_log_r10ttasm/config.json
run_stage R10_TTASM 4 2100 -p infereval -m mpp -c mpp_log_r10ttasm -s val -o

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R5D_DONE >> "$STATUS"
