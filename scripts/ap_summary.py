"""One-line mAP summary per run/protocol from the written metrics jsons.

Usage: python scripts/ap_summary.py [run ...]
"""
import json
import sys

BASE = "workspace/data/inference/DOTA_gsd50/val"
RUNS = sys.argv[1:] or ["mpp_log_r3", "mpp_r3", "mpp_r4"]
for run in RUNS:
    for proto in ["dota", "dota-SV"]:
        row = []
        for iou in ["0.05", "0.10", "0.25", "0.50", "0.75"]:
            try:
                m = json.load(open(f"{BASE}/{run}/{proto}/metrics{iou}.json"))
                aps = [v["ap"] for v in m.values()
                       if isinstance(v, dict) and "ap" in v]
                row.append(f"{iou}:{sum(aps) / len(aps):.4f}")
            except FileNotFoundError:
                row.append(f"{iou}:  -  ")
        print(f"{run:16s} {proto:8s} " + "  ".join(row))
