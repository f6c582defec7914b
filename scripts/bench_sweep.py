#!/usr/bin/env python
"""Sweep the vmapped-chain lane width of bench.py's headline measurement.

The scan chain's per-step cost on TPU is serialized VPU latency; extra vmap
lanes (= tiles of a scene, the reference's scale-out unit) amortize it until
the VPU saturates. This probes where that knee is so bench.py's default
batch reports the chip's actual throughput rather than an arbitrary width.

Usage: python scripts/bench_sweep.py [batch ...]   (default 16 32 64 128)
Writes one JSON line per width to stdout and /tmp/bench_sweep.jsonl.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    widths = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    from bench import bench_jax, build_tile, wait_for_device
    from mpp_cnn_rs_object_detection_tpu.utils.config import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    if not wait_for_device():
        print("device never came up", file=sys.stderr)
        return 1
    det, dists = build_tile()
    out = open("/tmp/bench_sweep.jsonl", "a")
    for b in widths:
        try:
            runs = [bench_jax(det, dists, batch=b) for _ in range(3)]
        except Exception as exc:  # a too-wide launch can fault the worker
            rec = {"batch": b, "error": f"{type(exc).__name__}: {exc}"}
            print(json.dumps(rec), flush=True)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            time.sleep(30)
            if not wait_for_device():
                break
            continue
        mps = [r[0] for r in runs]
        rec = {
            "batch": b,
            "moves_per_sec": sum(mps) / len(mps),
            "runs": [round(m) for m in mps],
        }
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
