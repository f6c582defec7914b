#!/usr/bin/env python
"""Collect every run's DOTA AP jsons into one table (stdout + optional
--json out). Scans <dataset>/inference-style dirs for dota*/metrics*.json."""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="workspace/data/inference/DOTA_gsd50/val")
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()
    rows = {}
    for mpath in sorted(glob.glob(os.path.join(args.root, "*", "dota*", "metrics*.json"))):
        parts = mpath.split(os.sep)
        run = parts[-3]
        postfix = parts[-2][4:]  # '' or '-SV'
        iou = parts[-1][len("metrics"):-len(".json")]
        with open(mpath) as f:
            m = json.load(f)
        ap_val = m.get("vehicle", {}).get("ap", m.get("map"))
        rows.setdefault((run, postfix), {})[float(iou)] = round(float(ap_val), 4)
    ious = [0.05, 0.1, 0.25, 0.5, 0.75]
    print(f"{'run':28s} {'eval':4s} " + " ".join(f"@{i:<5}" for i in ious))
    for (run, pf), vals in sorted(rows.items()):
        cells = " ".join(f"{vals.get(i, float('nan')):.4f}" for i in ious)
        print(f"{run:28s} {pf or 'obb':4s} {cells}")
    if args.json_out:
        out = {f"{run}{pf}": vals for (run, pf), vals in rows.items()}
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
