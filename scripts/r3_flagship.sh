#!/bin/bash
# Round-2 "r3" flagship: learned weights + exact scene mode + posnet
# ensemble maps + bilinear lookups + center refinement.
set -x
cd /root/repo
stamp() { date +%s; }

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m mpp -c mpp_log_r3 -o \
  > /tmp/r3_log_train.log 2>&1
echo "R3_LOGTRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r3_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r3 -s val -o \
  > /tmp/r3_log_infer.log 2>&1
echo "R3_LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r3_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_r3 -s val -o \
  > /tmp/r3_manual.log 2>&1
echo "R3_MANUAL rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r3_status.log

echo R3_DONE >> /tmp/r3_status.log
