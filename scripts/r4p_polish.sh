#!/bin/bash
# Polish ablation: re-run the r4 flagship infereval with gradient polish
# (inference.polish_steps=60) on the SAME trained artifacts — copies the
# mpp_r4 / mpp_log_r4 model dirs so calibration + learned weights are reused
# and only the polish flag differs. Waits for the r5 baseline runbook (the
# single TPU chip is serialized across runbooks via the status files).
set -x
cd /root/repo
stamp() { date +%s; }

while ! grep -q R5_DONE /tmp/r5_status.log 2>/dev/null; do sleep 120; done

MS=workspace/models_storage/mpp
for pair in "mpp_r4 mpp_r4p" "mpp_log_r4 mpp_log_r4p"; do
  set -- $pair
  rm -rf "$MS/$2"
  cp -r "$MS/$1" "$MS/$2"
  # drop the frozen config so the polished -c config is frozen instead
  rm -f "$MS/$2/config.json"
done

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r4p -s val -o \
  > /tmp/r4p_log_infer.log 2>&1
echo "R4P_LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r4p_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_r4p -s val -o \
  > /tmp/r4p_manual.log 2>&1
echo "R4P_MANUAL rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r4p_status.log

echo R4P_DONE >> /tmp/r4p_status.log
