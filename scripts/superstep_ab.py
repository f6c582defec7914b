#!/usr/bin/env python
"""A/B the superstep program variants at flagship scale (1024px, K=1024):
per-cell move-type draws vs the switched (one global type, lax.switch)
superstep, with/without data moves. Prints ms/superstep for each.

Run on the real chip (uses the device-yield protocol like bench.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402


def main():
    from mpp_cnn_rs_object_detection_tpu.utils.config import (
        clear_device_yield,
        enable_persistent_compilation_cache,
        request_device_yield,
    )
    from bench import build_tile, wait_for_device

    enable_persistent_compilation_cache()
    request_device_yield()
    try:
        if not wait_for_device():
            print("device unavailable", file=sys.stderr)
            return 1
        import jax

        from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
        from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
            LEGACY_SPEC,
            make_energy_maps,
        )
        from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
            make_kernel_data,
        )
        from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
            run_parallel_chain,
        )
        from mpp_cnn_rs_object_detection_tpu.mpp.state import empty_state
        from mpp_cnn_rs_object_detection_tpu.ops.mappings import (
            default_mappings,
        )

        det, dists = build_tile(1024, 1024, n_obj=200, seed=2)
        mappings = default_mappings(dists[0].shape[-1], 0, 32)
        maps = make_energy_maps(det, [-d for d in dists], 0.5, 4.0, 200.0,
                                mappings)
        kd = make_kernel_data(det, dists, mappings, intensity=200.0)
        comb = comb_lib.sum_combiner(LEGACY_SPEC.names)
        state = empty_state(1024)
        n_super = 128

        def run(ms, dm):
            final, stats = run_parallel_chain(
                jax.random.PRNGKey(0), state, maps, LEGACY_SPEC, comb, kd,
                n_supersteps=n_super, alpha_t=0.999,
                data_moves=dm, move_switch=ms,
            )
            jax.block_until_ready(stats.final_energy)
            return stats

        for ms in (False, True):
            for dm in (True, False):
                run(ms, dm)  # compile
                t0 = time.perf_counter()
                stats = run(ms, dm)
                dt = time.perf_counter() - t0
                print(
                    f"move_switch={ms} data_moves={dm}: "
                    f"{dt / n_super * 1e3:.2f} ms/superstep "
                    f"(n={int(stats.final_n_points)})",
                    flush=True,
                )
    finally:
        clear_device_yield()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
