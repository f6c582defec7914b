#!/bin/bash
# Polish ablation on the r9 flagship artifacts: re-run the mpp_log_r8
# infereval with gradient polish (inference.polish_steps=60) on the SAME
# trained weights — model dir copied so calibration + learned combinator are
# reused and only the polish flag differs. Chained after the r9 runbook.
set -x
cd /root/repo
stamp() { date +%s; }

while ! grep -q R9_DONE /tmp/r9_status.log 2>/dev/null; do sleep 120; done

MS=workspace/models_storage/mpp
rm -rf "$MS/mpp_log_r9p"
cp -r "$MS/mpp_log_r8" "$MS/mpp_log_r9p"
rm -f "$MS/mpp_log_r9p/config.json"

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r9p -s val -o \
  > /tmp/r9p_log_infer.log 2>&1
echo "R9P_LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r9p_status.log

echo R9P_DONE >> /tmp/r9p_status.log
