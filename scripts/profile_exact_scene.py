"""Stage-level wall-clock profile of the exact-scene MPP inference path.

Times every host/device stage for one val scene (maps load, naive init,
make_maps/kernel_data, chain segments incl. compile, papangelou, refine) so
optimisation targets the real bottleneck rather than the assumed one.

Usage: python scripts/profile_exact_scene.py [config_name] [image_id]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    cfg_name = sys.argv[1] if len(sys.argv) > 1 else "mpp_log_r2"
    img_id = int(sys.argv[2]) if len(sys.argv) > 2 else 2789

    t_imports = time.perf_counter()
    import jax

    from mpp_cnn_rs_object_detection_tpu.utils.config import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from mpp_cnn_rs_object_detection_tpu.mpp.image_data import (
        load_image_w_maps,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.mpp_model import MPPModel
    from mpp_cnn_rs_object_detection_tpu.mpp.refine import snap_centers_to_map
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import RJMCMCParams
    from mpp_cnn_rs_object_detection_tpu.mpp.scene import run_exact_scene

    stages = {"imports": time.perf_counter() - t_imports}

    t0 = time.perf_counter()
    cfg = json.load(open(f"/root/repo/model_configs/mpp/{cfg_name}.json"))
    model = MPPModel(cfg, phase="infer", load=True)
    stages["model_load"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    data = load_image_w_maps(
        img_id, model.dataset, "val", model.position_model, model.shape_model
    )
    stages["maps_load"] = time.perf_counter() - t0

    rj = cfg["inference"]["rjmcmc_params"]
    params = RJMCMCParams(
        n_steps=rj.get("burn_in", 30000),
        t0=rj.get("init_temperature", 1.0),
        t_target=rj.get("target_temperature", 0.0),
        alpha_t=rj.get("alpha_t", 0.999),
    )

    # run twice: first includes compile, second is steady-state
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        res = run_exact_scene(
            data, model.energy_setup, model.energy_model, params,
            seed=0, capacity=model.capacity,
        )
        stages[f"exact_scene_{tag}"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    snap_centers_to_map(
        np.asarray(res.centers).reshape(-1, 2), data.detection_map
    )
    stages["refine"] = time.perf_counter() - t0

    total_moves = res.total_moves
    for k, v in stages.items():
        print(f"{k:24s} {v:8.2f}s")
    warm = stages["exact_scene_warm"]
    print(
        f"moves={total_moves} warm_moves_per_sec={total_moves / warm:,.0f} "
        f"detections={len(res.centers)}"
    )


if __name__ == "__main__":
    main()
