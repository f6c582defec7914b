#!/bin/bash
# ROUND 5 phase-4 (time-permitting): TTA + split/merge stacked arm.
# Waits for R5C_DONE; requires R5D_HARD_END.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r5_status.log
if [ -z "$R5D_HARD_END" ]; then echo "R5D ABORT: set R5D_HARD_END" | tee -a "$STATUS"; exit 2; fi
while ! grep -q R5C_DONE "$STATUS" 2>/dev/null; do
  if [ "$(stamp)" -ge "$R5D_HARD_END" ]; then echo "R5D ABORT: hard end waiting for R5C_DONE" >> "$STATUS"; exit 0; fi
  sleep 30
done
t=$(stamp)
# only start if >=35 min remain: the arm needs ~25 min warm
if [ $(( R5D_HARD_END - t )) -lt 2100 ]; then
  echo "R5D SKIPPED (insufficient time)" >> "$STATUS"; exit 0
fi
rm -rf workspace/models_storage/mpp/mpp_log_r10ttasm
cp -r workspace/models_storage/mpp/mpp_log_r10tta workspace/models_storage/mpp/mpp_log_r10ttasm
rm -f workspace/models_storage/mpp/mpp_log_r10ttasm/config.json
cp model_configs/mpp/mpp_log_r10ttasm.json workspace/models_storage/mpp/mpp_log_r10ttasm/config.json
echo '{"copied_from": "mpp/mpp_log_r10tta", "note": "weights/calibration byte-copied by scripts/r5d_arms.sh"}' \
  > workspace/models_storage/mpp/mpp_log_r10ttasm/PROVENANCE.json
t0=$(stamp)
timeout -k 60 $(( R5D_HARD_END - $(stamp) )) python scripts/resilient_run.py 4 -- \
  -p infereval -m mpp -c mpp_log_r10ttasm -s val -o > /tmp/r5d_TTASM.log 2>&1
echo "R5D_TTASM rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R5D_DONE >> "$STATUS"
