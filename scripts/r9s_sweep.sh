#!/bin/bash
# ROUND 3 PHASE B (rewritten in place; the round-2 chain driver invokes this
# after r9p_polish.sh = round-3 phase A). The big AP lever + capability rows:
#
#   1. baseline detectors on real DOTA_gsd50: fasterrcnn_quick + bbavec_quick
#      + oracle train/infereval AP rows (VERDICT r2 item 8) — cheap, so they
#      run before the multi-hour extends and cannot be starved by them.
#   2. extend pos_r2cp and shape_r2cp from 136 to the reference recipe's
#      256 epochs via in-place resume (VERDICT r2 item 5).
#   3. mpp_log_r10: calibrate + ordering-criterion weight train + exact-scene
#      infereval on the 256-epoch CNNs (round-3 flagship number).
#   4. if time remains: extend pos_r2 (the ensemble's no-cp member) to 256.
#
# Every stage is deadline-guarded so the chip is quiet when the driver's
# end-of-round bench.py runs (the r02 BENCH starvation post-mortem).
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r3b_status.log
DEADLINE=1787180400   # 23:00 UTC 2026-08-19
guard() { [ "$(stamp)" -lt "$DEADLINE" ]; }

while ! grep -q R3A_DONE /tmp/r3a_status.log 2>/dev/null; do sleep 120; done

run_stage() { # tag attempts args...
  local tag=$1 attempts=$2; shift 2
  guard || { echo "R3B_${tag} SKIPPED (deadline)" >> "$STATUS"; return; }
  t0=$(stamp)
  python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r3b_${tag}.log" 2>&1
  echo "R3B_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
}

# --- 1. baseline detector AP rows (quick budgets)
run_stage FRCNN_TRAIN 5 -p train -m fasterrcnn -c fasterrcnn_quick -o
run_stage FRCNN_INFER 5 -p infereval -m fasterrcnn -c fasterrcnn_quick -s val -o
run_stage BBAVEC_TRAIN 5 -p train -m bbavec -c bbavec_quick -o
run_stage BBAVEC_INFER 5 -p infereval -m bbavec -c bbavec_quick -s val -o
run_stage ORACLE 3 -p infereval -m oracle -c config_oracle -s val -o

# --- 2. 256-epoch extends (resume in place: same model_name, higher n_epochs)
run_stage POS_R2CP_256 10 -p train -m posnet -c pos_r2cp_256 -r
run_stage SHAPE_R2CP_256 10 -p train -m shapenet -c shape_r2cp_256 -r
python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1

# --- 3. round-3 flagship on the 256-epoch CNNs
run_stage MPP_R10_TRAIN 5 -p train -m mpp -c mpp_log_r10 -o
run_stage MPP_R10_INFER 10 -p infereval -m mpp -c mpp_log_r10 -s val -o

# --- 4. opportunistic: extend the ensemble's no-cp member too
run_stage POS_R2_256 10 -p train -m posnet -c pos_r2_256 -r

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R3B_DONE >> "$STATUS"
