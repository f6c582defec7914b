"""TPU-native rebuild of the MPP+CNN remote-sensing object detection framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
Ayana-Inria/MPP_CNN_RS_object_detection (Mabon, Ortner, Zerubia -- MLSP/SPIE 2022):
U-Net energy-map CNNs (PosNet / ShapeNet), a Marked Point Process with Gibbs
energies over oriented rectangles, and an RJMCMC simulated-annealing sampler --
re-designed TPU-first:

- CNNs are flax modules trained/jitted with pjit over a device mesh (NHWC, bf16).
- The MPP point set is a fixed-capacity struct-of-arrays; energies are pure
  vectorised functions (rotated-rect overlap replaces shapely with closed-form
  convex clipping); the RJMCMC chain is a jax.lax.scan, vmapped over many
  chains/tiles per chip instead of one Python loop per process.
- Scene-scale parallelism uses jax.sharding meshes + collectives instead of
  multiprocessing.Pool.
"""

__version__ = "0.1.0"
