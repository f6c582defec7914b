#!/bin/bash
# Restarts ablation + all-in flagship: mpp_log_r7 re-runs the r4 learned-
# weights exact-scene infereval with inference.restarts=4 (only that knob
# changed); mpp_log_best combines every quality extension (TTA maps +
# restarts=4 + polish=60) on the same trained artifacts. Waits for the r6
# runbook (single TPU chip serialized across runbooks via status files).
set -x
cd /root/repo
stamp() { date +%s; }

while ! grep -q R6_DONE /tmp/r6_status.log 2>/dev/null; do sleep 120; done

MS=workspace/models_storage/mpp
for pair in "mpp_log_r4 mpp_log_r7" "mpp_log_r4 mpp_log_best"; do
  set -- $pair
  rm -rf "$MS/$2"
  cp -r "$MS/$1" "$MS/$2"
  rm -f "$MS/$2/config.json"
done

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r7 -s val -o \
  > /tmp/r7_log_infer.log 2>&1
echo "R7_LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r7_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_best -s val -o \
  > /tmp/r7_best_infer.log 2>&1
echo "R7_BEST rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r7_status.log

echo R7_DONE >> /tmp/r7_status.log
