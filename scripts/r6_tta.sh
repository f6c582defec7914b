#!/bin/bash
# TTA ablation: the r4 flagship configs with dihedral test-time-augmented CNN
# maps (pos_r2_tta/pos_quick_tta/shape_r2_tta are weight-copies of the r2
# models with inference.tta=true; ensure_cnn_inference regenerates their map
# artifacts under the new names). Calibration + learned weights are copied
# from the r4 runs so ONLY the maps differ. Waits for the r4p runbook.
set -x
cd /root/repo
stamp() { date +%s; }

while ! grep -q R4P_DONE /tmp/r4p_status.log 2>/dev/null; do sleep 120; done

MS=workspace/models_storage/mpp
for pair in "mpp_r4 mpp_r6" "mpp_log_r4 mpp_log_r6"; do
  set -- $pair
  rm -rf "$MS/$2"
  cp -r "$MS/$1" "$MS/$2"
  rm -f "$MS/$2/config.json"
done

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r6 -s val -o \
  > /tmp/r6_log_infer.log 2>&1
echo "R6_LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r6_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_r6 -s val -o \
  > /tmp/r6_manual.log 2>&1
echo "R6_MANUAL rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r6_status.log

echo R6_DONE >> /tmp/r6_status.log
