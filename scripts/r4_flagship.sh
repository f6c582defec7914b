#!/bin/bash
# Round-2 "r4" flagship: interpolated mark energies + bin-center decode +
# blend=4 + PR-tail backfill, on the r3 stack (exact scene mode, ensemble
# maps, bilinear lookups, center refinement). Learned weights retrain under
# the new energies (mpp_log_r4). Waits for the device via resilient_run.
set -x
cd /root/repo
stamp() { date +%s; }

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m mpp -c mpp_r4 -o \
  > /tmp/r4_train.log 2>&1
echo "R4_TRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r4_status.log

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m mpp -c mpp_log_r4 -o \
  > /tmp/r4_log_train.log 2>&1
echo "R4_LOGTRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r4_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r4 -s val -o \
  > /tmp/r4_log_infer.log 2>&1
echo "R4_LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r4_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_r4 -s val -o \
  > /tmp/r4_manual.log 2>&1
echo "R4_MANUAL rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r4_status.log

echo R4_DONE >> /tmp/r4_status.log
