#!/bin/bash
# ROUND 5 phase-3: split/merge flagship A/B + mid-round bench evidence.
# Waits for R5B_DONE. R5C_HARD_END (epoch seconds) REQUIRED.
set -x
cd /root/repo
stamp() { date +%s; }
STATUS=/tmp/r5_status.log

if [ -z "$R5C_HARD_END" ]; then
  echo "R5C ABORT: set R5C_HARD_END explicitly" | tee -a "$STATUS"
  exit 2
fi
while ! grep -q R5B_DONE "$STATUS" 2>/dev/null; do
  if [ "$(stamp)" -ge "$R5C_HARD_END" ]; then
    echo "R5C ABORT: hard end reached waiting for R5B_DONE" >> "$STATUS"
    exit 0
  fi
  sleep 30
done

run_stage() { # tag attempts args...
  local tag=$1 attempts=$2; shift 2
  local t=$(stamp)
  if [ "$t" -ge "$R5C_HARD_END" ]; then
    echo "R5C_${tag} SKIPPED (hard end)" >> "$STATUS"
    return
  fi
  local budget=$(( R5C_HARD_END - t ))
  local t0=$(stamp)
  timeout -k 60 "$budget" python scripts/resilient_run.py "$attempts" -- "$@" \
    > "/tmp/r5c_${tag}.log" 2>&1
  echo "R5C_${tag} rc=$? dt=$(( $(stamp) - t0 ))s" >> "$STATUS"
  python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
}

clone_model() { # src dst
  rm -rf "workspace/models_storage/$2"
  cp -r "workspace/models_storage/$1" "workspace/models_storage/$2"
  rm -f "workspace/models_storage/$2/config.json"
  echo "{\"copied_from\": \"$1\", \"note\": \"weights/calibration byte-copied by scripts/r5c_arms.sh\"}" \
    > "workspace/models_storage/$2/PROVENANCE.json"
}

# --- 1. split/merge superstep A/B on the dd flagship
clone_model mpp/mpp_log_r10dd mpp/mpp_log_r10sm
cp model_configs/mpp/mpp_log_r10sm.json \
   workspace/models_storage/mpp/mpp_log_r10sm/config.json
run_stage R10_SM 5 -p infereval -m mpp -c mpp_log_r10sm -s val -o

# --- 2. mid-round bench evidence run (also warms the TPU signatures the
# driver's round-end bench will hit)
t=$(stamp)
if [ "$t" -lt "$R5C_HARD_END" ]; then
  timeout -k 60 $(( R5C_HARD_END - t )) python bench.py \
    > /tmp/r5c_BENCH.json 2> /tmp/r5c_BENCH.err
  echo "R5C_BENCH rc=$?" >> "$STATUS"
  tail -1 /tmp/r5c_BENCH.json >> "$STATUS"
fi

python scripts/snapshot_artifacts.py >> "$STATUS" 2>&1
echo R5C_DONE >> "$STATUS"
