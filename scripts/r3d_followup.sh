#!/bin/bash
# ROUND 3 PHASE D — after r3c: re-export rows that predate the sub-pixel GT
# fix (dota_writer.py now writes GT at "%.1f"; phase-B bbavec/oracle rows
# were evaluated against int-truncated GT). Inference re-runs re-export GT
# and detections; eval then scores against exact geometry.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r3d_status.log
BLACKOUT_START=1787178600  # 22:30 UTC 2026-08-19
BLACKOUT_END=1787186700    # 00:45 UTC 2026-08-20
HARD_END=1787208000

wait_window() {
  while :; do
    t=$(stamp)
    [ "$t" -ge "$HARD_END" ] && return 1
    if [ "$t" -lt "$BLACKOUT_START" ] || [ "$t" -gt "$BLACKOUT_END" ]; then
      return 0
    fi
    sleep 120
  done
}

run_stage() {
  local tag=$1 attempts=$2; shift 2
  wait_window || { echo "R3D_${tag} SKIPPED (hard end)" >> "$STATUS"; return; }
  t0=$(stamp)
  python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r3d_${tag}.log" 2>&1
  echo "R3D_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
}

while ! grep -q R3C_DONE /tmp/r3c_status.log 2>/dev/null; do sleep 120; done

# the 256-epoch flagship: phase B's 23:00 deadline guard may have skipped
# these if the shape extend ran long — run them here if the combinator is
# missing (idempotent; phase B's run wins if it happened)
MS=workspace/models_storage/mpp
if ! [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  run_stage MPP_R10_TRAIN 5 -p train -m mpp -c mpp_log_r10 -o
fi
run_stage MPP_R10_INFER 10 -p infereval -m mpp -c mpp_log_r10 -s val -o
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  rm -rf "$MS/mpp_log_r10parity"
  cp -r "$MS/mpp_log_r10" "$MS/mpp_log_r10parity"
  rm -f "$MS/mpp_log_r10parity/config.json"
  run_stage R10_PARITY2 5 -p infereval -m mpp -c mpp_log_r10parity -s val -o
fi

# polish arm: same trained r10 weights, + 64 zero-T gradient-polish steps
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  rm -rf "$MS/mpp_log_r10pol"
  cp -r "$MS/mpp_log_r10" "$MS/mpp_log_r10pol"
  rm -f "$MS/mpp_log_r10pol/config.json"
  run_stage R10_POLISH 5 -p infereval -m mpp -c mpp_log_r10pol -s val -o
fi

# TTA arm: weight-copy the (extended) CNNs, regenerate dihedral-TTA maps
# under the *_tta names, run the same trained r10 weights on them
if [ -f "$MS/mpp_log_r10/energy_combination_model.json" ]; then
  for pair in "posnet/pos_r2cp posnet/pos_r2cp_tta" \
              "posnet/pos_r2 posnet/pos_r2_tta" \
              "shapenet/shape_r2cp shapenet/shape_r2cp_tta"; do
    set -- $pair
    rm -rf "workspace/models_storage/$2"
    cp -r "workspace/models_storage/$1" "workspace/models_storage/$2"
    rm -f "workspace/models_storage/$2/config.json"
  done
  rm -rf "$MS/mpp_log_r10tta"
  cp -r "$MS/mpp_log_r10" "$MS/mpp_log_r10tta"
  rm -f "$MS/mpp_log_r10tta/config.json"
  run_stage R10_TTA 5 -p infereval -m mpp -c mpp_log_r10tta -s val -o
fi

run_stage BBAVEC_INFER3 5 -p infereval -m bbavec -c bbavec_quick -s val -o
run_stage ORACLE2 3 -p infereval -m oracle -c config_oracle -s val -o

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R3D_DONE >> "$STATUS"
