#!/bin/bash
# Round-2 "r8": copy-paste-augmented flagship CNNs (pos_r2cp/shape_r2cp,
# 136-epoch device-pipeline recipe + copy_paste) + learned-weight MPP
# infereval on the exact-scene stack (mpp_log_r8, ensembled with pos_r2).
# Chained after the r7 runbook on the single chip.
set -x
cd /root/repo
stamp() { date +%s; }

while ! grep -q R7_DONE /tmp/r7_status.log 2>/dev/null; do sleep 120; done

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m posnet -c pos_r2cp -o \
  > /tmp/r8_pos_train.log 2>&1
echo "R8_POS_TRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r8_status.log

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m shapenet -c shape_r2cp -o \
  > /tmp/r8_shape_train.log 2>&1
echo "R8_SHAPE_TRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r8_status.log

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m mpp -c mpp_log_r8 -o \
  > /tmp/r8_log_train.log 2>&1
echo "R8_LOGTRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r8_status.log

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r8 -s val -o \
  > /tmp/r8_log_infer.log 2>&1
echo "R8_LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r8_status.log

echo R8_DONE >> /tmp/r8_status.log
