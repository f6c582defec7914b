#!/bin/bash
# Round-2 flagship sequence (run after shape_r2 training completes).
# Each stage logs to /tmp/r2_<stage>.log; resilient_run survives worker faults.
set -x
cd /root/repo

wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }

# 0. wait for shapenet training to finish
[ -f /tmp/shape_train.pid ] && wait_pid "$(cat /tmp/shape_train.pid)"

stamp() { date +%s; }

# 1. exact-mode TPU smoke (quick models; validates the exact sampler on axon)
t0=$(stamp)
python scripts/resilient_run.py 5 -- -p infer -m mpp -c mpp_exact_smoke -s val -o \
  > /tmp/r2_smoke.log 2>&1
echo "SMOKE rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r2_status.log

# 2. learned-weights training (calibrate + ordering criterion)
t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m mpp -c mpp_log_r2 -o \
  > /tmp/r2_log_train.log 2>&1
echo "LOGTRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r2_status.log

# 3. flagship learned-weights infer+eval on val (exact scene mode)
t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r2 -s val -o \
  > /tmp/r2_log_infer.log 2>&1
echo "LOGINFER rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r2_status.log

# 4. manual-weights flagship (hrcM parity) infer+eval on val
t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_r2 -s val -o \
  > /tmp/r2_manual.log 2>&1
echo "MANUAL rc=$? dt=$(( $(stamp) - t0 ))s" >> /tmp/r2_status.log

echo DONE >> /tmp/r2_status.log
