#!/bin/bash
# Restore the writable workspace after a VM reset (everything outside git is
# wiped; only /root/repo and the read-only /root/reference survive).
# paths_config.json resolves workspace/{data,models_storage} against the
# repo root; the reference sample is already in the translated custom format.
set -e
cd "$(dirname "$0")/.."
mkdir -p workspace/data workspace/models_storage
if [ ! -d workspace/data/DOTA_gsd50 ]; then
  cp -r /root/reference/data_sample/DOTA_gsd50 workspace/data/
  echo "restored workspace/data/DOTA_gsd50 from the reference sample"
fi
# trained-model artifacts snapshotted into git (scripts/snapshot_artifacts.py)
if [ -d artifacts/models_storage ]; then
  python scripts/snapshot_artifacts.py --restore
fi
echo "workspace ready: $(ls workspace/data)"
