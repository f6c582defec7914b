#!/bin/bash
# Baseline detectors on the real DOTA_gsd50 sample: quick-budget Faster R-CNN
# (HBB) and BBAVectors/CTRBOX (OBB) train + infereval, recording AP for
# BASELINE.md. Waits for the r4 flagship runbook to finish first (both need
# the single TPU chip).
set -x
cd /root/repo
stamp() { date +%s; }

while ! grep -q R4_DONE /tmp/r4_status.log 2>/dev/null; do sleep 120; done

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m fasterrcnn -c fasterrcnn_quick -o \
  > /tmp/r5_frcnn_train.log 2>&1
echo "R5_FRCNN_TRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r5_status.log

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p infereval -m fasterrcnn -c fasterrcnn_quick -s val -o \
  > /tmp/r5_frcnn_infer.log 2>&1
echo "R5_FRCNN_INFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r5_status.log

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m bbavec -c bbavec_quick -o \
  > /tmp/r5_bbavec_train.log 2>&1
echo "R5_BBAVEC_TRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r5_status.log

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p infereval -m bbavec -c bbavec_quick -s val -o \
  > /tmp/r5_bbavec_infer.log 2>&1
echo "R5_BBAVEC_INFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r5_status.log

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p infereval -m oracle -c config_oracle -s val -o \
  > /tmp/r5_oracle.log 2>&1
echo "R5_ORACLE rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r5_status.log

echo R5_DONE >> /tmp/r5_status.log
