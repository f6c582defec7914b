#!/usr/bin/env python
"""Time the 8-way shard_map exact-chain compile on the virtual CPU mesh
under different XLA backend settings (round-5: MULTICHIP must fit the
driver budget; the persistent cache cannot help — XLA:CPU AOT entries fail
machine-feature validation on reload in this image).

Usage: python scripts/dryrun_compile_probe.py [extra_xla_flags]
Re-execs itself with the 8-device CPU mesh + the given flags.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child():
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
    from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import (
        NoCalibrationEnergySetup,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import ImageWMaps
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import CELL
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_mpp_on_scene
    from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

    devices = jax.devices()[:8]
    W, C = 64, 4
    H8 = 2 * CELL * 8
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    gy8, gx8 = np.mgrid[:H8, :W]
    det8 = np.zeros((H8, W), np.float32)
    for c in [(40, 20), (200, 40), (330, 30), (460, 50)]:
        det8 += np.exp(-((gy8 - c[0]) ** 2 + (gx8 - c[1]) ** 2) / 8.0)
    det8 = np.clip(det8, 0, 1)
    dist8 = np.full((H8, W, C), 1.0, np.float32)
    dist8[..., 2] = 4.0
    dist8 /= dist8.sum(-1, keepdims=True)

    def scene():
        return ImageWMaps(
            image=np.stack([det8] * 3, -1), name="probe", shape=(H8, W),
            detection_map=det8.copy(),
            param_dist_maps=[dist8.copy() for _ in range(3)],
            mappings=mappings,
            labels={"centers": np.asarray([(40, 20)], np.float32),
                    "parameters": np.asarray([[3.0, 7.0, 0.3]], np.float32),
                    "categories": np.zeros((1,), np.int32),
                    "difficult": np.zeros((1,), bool)},
            gt_centers=np.asarray([(40, 20)], np.float32),
            gt_marks=np.asarray([[5.0, 0.5, 0.3]], np.float32),
        )

    setup = NoCalibrationEnergySetup()
    setup.calibrate([scene()], np.random.default_rng(0), save_path="")
    comb = comb_lib.sum_combiner(setup.spec.names)
    params = RJMCMCParams(n_steps=64, alpha_t=0.94, n_samples=0,
                          samples_interval=4)
    mesh8 = Mesh(np.array(devices), ("rows",))
    t0 = time.time()
    r = run_mpp_on_scene(scene(), setup, comb, params, seed=0, capacity=8,
                         scene_mode="exact", mesh=mesh8)
    print(f"8-way compile+run: {time.time() - t0:.1f}s "
          f"detections={len(r.centers)}", flush=True)
    t0 = time.time()
    r2 = run_mpp_on_scene(scene(), setup, comb, params, seed=0, capacity=8,
                          scene_mode="exact", mesh=mesh8)
    print(f"8-way warm re-run (in-process executable): "
          f"{time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    r1 = run_mpp_on_scene(scene(), setup, comb, params, seed=0, capacity=8,
                          scene_mode="exact", mesh=None)
    print(f"single compile+run: {time.time() - t0:.1f}s "
          f"detections={len(r1.centers)}", flush=True)
    assert len(r.centers) == len(r1.centers) == len(r2.centers)
    print("equal: OK", flush=True)


if __name__ == "__main__":
    if os.environ.get("_PROBE_CHILD"):
        child()
    else:
        extra = " ".join(sys.argv[1:])
        env = dict(os.environ)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            flags += " --xla_force_host_platform_device_count=8"
        env["XLA_FLAGS"] = (flags + " " + extra).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["_PROBE_CHILD"] = "1"
        print(f"XLA_FLAGS={env['XLA_FLAGS']}", flush=True)
        sys.exit(subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)], env=env,
            cwd=REPO,
        ).returncode)
