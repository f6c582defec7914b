#!/bin/bash
# ROUND 5 phase-5: parity-mode row of the new flagship. After R5D_DONE.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r5_status.log
if [ -z "$R5E_HARD_END" ]; then echo "R5E ABORT: set R5E_HARD_END" | tee -a "$STATUS"; exit 2; fi
while ! grep -q R5D_DONE "$STATUS" 2>/dev/null; do
  if [ "$(stamp)" -ge "$R5E_HARD_END" ]; then echo "R5E ABORT: hard end waiting for R5D_DONE" >> "$STATUS"; exit 0; fi
  sleep 30
done
t=$(stamp)
if [ $(( R5E_HARD_END - t )) -lt 1800 ]; then
  echo "R5E SKIPPED (insufficient time)" >> "$STATUS"; exit 0
fi
rm -rf workspace/models_storage/mpp/mpp_log_r11lsttapar
cp -r workspace/models_storage/mpp/mpp_log_r11lstta workspace/models_storage/mpp/mpp_log_r11lsttapar
rm -f workspace/models_storage/mpp/mpp_log_r11lsttapar/config.json
cp model_configs/mpp/mpp_log_r11lsttapar.json workspace/models_storage/mpp/mpp_log_r11lsttapar/config.json
echo '{"copied_from": "mpp/mpp_log_r11lstta", "note": "weights/calibration byte-copied by scripts/r5e_arms.sh"}' \
  > workspace/models_storage/mpp/mpp_log_r11lsttapar/PROVENANCE.json
t0=$(stamp)
timeout -k 60 $(( R5E_HARD_END - $(stamp) )) python scripts/resilient_run.py 4 -- \
  -p infereval -m mpp -c mpp_log_r11lsttapar -s val -o > /tmp/r5e_PAR.log 2>&1
echo "R5E_PAR rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R5E_DONE >> "$STATUS"
