"""XLA cost analysis of the exact-scene superstep program at flagship scale
(documented in BASELINE.md round-2 runtime analysis). CPU-runnable: XLA
cost analysis (flops/bytes) is device-agnostic."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
os.chdir("/root/repo"); sys.path.insert(0, "/root/repo")

from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.energies import LEGACY_SPEC, make_energy_maps
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import make_kernel_data
from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings
from mpp_cnn_rs_object_detection_tpu.parallel.sharded_scene import run_exact_scene_chain

# flagship scale: 926x958 scene, K=1024
H, W, C, K = 928, 960, 32, 1024
mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
det = np.random.default_rng(0).uniform(0, 1, (H, W)).astype(np.float32)
dist = np.full((H, W, C), 1.0 / C, np.float32)
maps = make_energy_maps(det, [-dist] * 3, 0.5, 4.0, 200.0, mappings)
kd = make_kernel_data(det, [dist] * 3, mappings, intensity=64)
comb = comb_lib.sum_combiner(LEGACY_SPEC.names)
xy = np.random.default_rng(1).uniform(0, 400, (100, 2)).astype(np.float32)
marks = np.tile([[5.0, 0.5, 0.3]], (100, 1)).astype(np.float32)
state = state_from_arrays(xy, marks, capacity=K)

N_SUPER = 64  # one segment slice
fn = lambda key, st: run_exact_scene_chain(
    key, st, maps, LEGACY_SPEC, comb, kd, n_supersteps=N_SUPER,
    t0=1.0, alpha_t=0.999, t_target=0.0)
key = jax.random.PRNGKey(0)
t0 = time.time()
lowered = jax.jit(fn).lower(key, state)
compiled = lowered.compile()
print(f"CPU compile of {N_SUPER}-superstep segment: {time.time()-t0:.0f}s", flush=True)
ca = compiled.cost_analysis()
if isinstance(ca, list): ca = ca[0]
flops = ca.get("flops", float("nan"))
bytes_ = ca.get("bytes accessed", float("nan"))
print(f"flops/superstep = {flops/N_SUPER:.3e}")
print(f"bytes/superstep = {bytes_/N_SUPER:.3e}")
total_super = 7500
# v5e: ~197 TFLOP/s bf16, ~1.6e12 f32; HBM ~819 GB/s
print(f"whole chain ({total_super} supersteps): "
      f"flops={flops/N_SUPER*total_super:.3e} "
      f"bytes={bytes_/N_SUPER*total_super:.3e}")
print(f"HBM-bound estimate @819GB/s: {bytes_/N_SUPER*total_super/819e9:.1f}s")
print(f"f32-VPU-bound estimate @~8e12/s: {flops/N_SUPER*total_super/8e12:.1f}s")
