"""Measure trace/lower cost and module size of the exact-scene chain program.

The flagship wall clock is dominated by XLA compile of the superstep chain
(~350 s per signature on this 1-core host, BASELINE.md round-2 analysis).
This probe splits that cost into jax trace+lower (shared with any backend)
vs backend compile, and reports StableHLO op counts so program-size
reductions can be validated without TPU access.

Usage: MPP_PLATFORM=cpu python scripts/compile_probe.py [H W K n_supersteps]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("MPP_PLATFORM", "cpu")

import numpy as np


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    n_super = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    import jax

    if os.environ.get("MPP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MPP_PLATFORM"])

    from bench import build_tile
    from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import build_cache
    from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays
    from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings
    from mpp_cnn_rs_object_detection_tpu.parallel import sharded_scene as ss

    rng = np.random.default_rng(0)
    det, dists = build_tile(h, w, n_obj=64, seed=0)
    mappings = default_mappings(dists[0].shape[-1], 0, 32)
    centers = rng.integers(8, [h - 8, w - 8], size=(64, 2)).astype(np.float32)
    data = ImageWMaps(
        image=np.stack([det] * 3, -1), name="probe", shape=(h, w),
        detection_map=det, param_dist_maps=list(dists), mappings=mappings,
        labels={"centers": centers,
                "parameters": np.tile(np.asarray([[4.0, 9.0, 0.4]],
                                                 np.float32), (64, 1)),
                "categories": np.zeros(64, np.int32),
                "difficult": np.zeros(64, bool)},
        gt_centers=centers,
        gt_marks=np.tile(np.asarray([[6.5, 0.44, 0.4]], np.float32), (64, 1)),
    )
    setup = NoCalibrationEnergySetup()
    setup.calibrate([data], rng, save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    maps = setup.make_maps(data)
    kd = setup.make_kernel_data(data, intensity=64)

    c0 = centers[: min(64, k)].astype(np.float32)
    m0 = np.tile(np.asarray([[6.5, 0.44, 0.4]], np.float32), (len(c0), 1))
    state = state_from_arrays(c0, m0, capacity=k)
    t0 = time.perf_counter()
    cache0 = build_cache(state, maps, setup.spec)
    cache0 = jax.tree_util.tree_map(lambda x: x.block_until_ready(), cache0)
    t_cache = time.perf_counter() - t0

    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import energy_from_cache

    u0 = energy_from_cache(state, maps, setup.spec, comb, cache0)

    key = jax.random.PRNGKey(0)
    args = (key, state, cache0, u0, maps, kd, setup.spec, comb,
            n_super, 1.0, 0.999, 0.0)

    t0 = time.perf_counter()
    lowered = ss._local_chain.lower(*args)
    t_lower = time.perf_counter() - t0

    text = lowered.as_text()
    n_lines = text.count("\n")
    import collections
    ops = collections.Counter()
    for line in text.split("\n"):
        s = line.strip()
        if "= stablehlo." in s or s.startswith("stablehlo."):
            op = s.split("stablehlo.", 1)[1].split(" ", 1)[0].split("(")[0]
            ops[op] += 1

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    print(f"shape=({h},{w}) K={k} n_supersteps={n_super} "
          f"backend={jax.default_backend()}")
    print(f"build_cache: {t_cache:.1f}s  trace+lower: {t_lower:.1f}s  "
          f"backend-compile: {t_compile:.1f}s")
    print(f"stablehlo: {n_lines} lines, {sum(ops.values())} ops")
    for op, c in ops.most_common(20):
        print(f"  {op:30s} {c}")
    try:
        mem = compiled.memory_analysis()
        print(f"temp={getattr(mem, 'temp_size_in_bytes', None)} "
              f"output={getattr(mem, 'output_size_in_bytes', None)}")
    except Exception:
        pass


if __name__ == "__main__":
    main()
