#!/bin/bash
# Chain the bench lane-width sweep after the r9p polish ablation frees the
# single TPU chip.
set -x
cd /root/repo
while ! grep -q R9P_DONE /tmp/r9p_status.log 2>/dev/null; do sleep 120; done
python scripts/bench_sweep.py > /tmp/bench_sweep.log 2>&1
echo "R9S_SWEEP rc=$?" >> /tmp/r9s_status.log
echo R9S_DONE >> /tmp/r9s_status.log
