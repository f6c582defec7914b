#!/bin/bash
# Round-2 "r9": full rebuild of the flagship artifact chain after a VM reset
# wiped workspace/ (trained models + translated data). Data is restored by
# copying /root/reference/data_sample/DOTA_gsd50 into workspace/data first.
#
# Chain (dependency order):
#   pos_r2cp   136-epoch posnet + copy-paste  (headline + shape_r2cp's pos)
#   pos_r2     136-epoch posnet, no copy-paste (ensemble member of mpp_log_r8)
#   shape_r2cp 136-epoch shapenet + copy-paste
#   mpp_log_r8 calibrate + ordering-criterion weight train, then exact-scene
#              infereval on val (ensembled pos maps, refine, blend, backfill).
#
# Each train stage: one overwrite attempt, then resume-on-retry so a worker
# crash costs at most the epochs since the last rolling checkpoint.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r9_status.log

train_stage() { # name, -m model, -c config
  local tag=$1 model=$2 cfg=$3
  t0=$(stamp)
  python scripts/resilient_run.py 1 -- -p train -m "$model" -c "$cfg" -o \
    > "/tmp/r9_${tag}.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    python scripts/resilient_run.py 10 -- -p train -m "$model" -c "$cfg" -r \
      >> "/tmp/r9_${tag}.log" 2>&1
    rc=$?
  fi
  echo "R9_${tag} rc=$rc dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
}

train_stage POS_R2CP posnet pos_r2cp
train_stage POS_R2 posnet pos_r2
train_stage SHAPE_R2CP shapenet shape_r2cp

t0=$(stamp)
python scripts/resilient_run.py 5 -- -p train -m mpp -c mpp_log_r8 -o \
  > /tmp/r9_mpp_train.log 2>&1
echo "R9_MPP_TRAIN rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"

t0=$(stamp)
python scripts/resilient_run.py 10 -- -p infereval -m mpp -c mpp_log_r8 -s val -o \
  > /tmp/r9_mpp_infer.log 2>&1
echo "R9_MPP_INFER rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"

echo R9_DONE >> "$STATUS"
