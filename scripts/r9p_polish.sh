#!/bin/bash
# ROUND 3 PHASE A (rewritten in place: the round-2 chain driver invokes this
# file after r9_rebuild.sh, so its content at invocation time IS the round-3
# plan). Cheap high-value evaluation passes on the r9 flagship artifacts:
#
#   1. parity-mode infereval  — same trained mpp_log_r8 weights/calibration,
#      every non-reference rescoring extension OFF (VERDICT r2 item 4).
#   2. warm re-run of the mpp_log_r8 infereval — records the warm-compile-
#      cache end-to-end wall clock (VERDICT r2 item 7; the r9 run is the
#      cold number).
#   3. posnet-level copy-paste A/B at the 136-epoch budget: pos_r2 (no cp)
#      vs pos_r2cp (cp) HBB infereval on val (VERDICT r2 item 3 — the
#      mpp-level A/B needs shape_r2 which the VM reset destroyed; the
#      posnet arm pair is fully trained).
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r3a_status.log
# quiesce: leave the chip free for the driver's end-of-round bench + suite
DEADLINE=1787180400   # 23:00 UTC 2026-08-19
guard() { [ "$(stamp)" -lt "$DEADLINE" ]; }

while ! grep -q R9_DONE /tmp/r9_status.log 2>/dev/null; do sleep 120; done

MS=workspace/models_storage/mpp
if guard; then
  rm -rf "$MS/mpp_log_r8parity"
  cp -r "$MS/mpp_log_r8" "$MS/mpp_log_r8parity"
  rm -f "$MS/mpp_log_r8parity/config.json"
  t0=$(stamp)
  python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r8parity -s val -o \
    > /tmp/r3a_parity_infer.log 2>&1
  echo "R3A_PARITY rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
fi

if guard; then
  t0=$(stamp)
  python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r8 -s val -o \
    > /tmp/r3a_warm_infer.log 2>&1
  echo "R3A_WARM rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
fi

for P in pos_r2 pos_r2cp; do
  if guard; then
    t0=$(stamp)
    python scripts/resilient_run.py 5 -- -p infereval -m posnet -c "$P" -s val -o \
      > "/tmp/r3a_${P}_infer.log" 2>&1
    echo "R3A_${P} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  fi
done

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R3A_DONE >> "$STATUS"
