"""Gradient polish of final detections — zero-temperature continuous
refinement.

After annealing, every detection sits wherever the last accepted discrete
move left it: positions wander ~0.7 px inside the detection-map blob and
marks sit at whatever in-bin value the chain sampled. The whole energy
U(config) is differentiable in this framework (bilinear position lookups,
tri-linear mark lookups, closed-form quad clipping), so a few Adam steps on
(xy, marks) of the final configuration descend the SAME energy the chain
annealed — a continuous local relaxation the reference cannot do (its energy
reads integer-pixel gathers and shapely areas, ``data_energies.py:18-22``).

No reference equivalent (extension); default-off via
``inference.polish_steps``. The returned state is the best-energy iterate, so
polish never worsens U. Dead slots carry zero gradient (every energy term is
alive-masked) and keep their values.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from functools import partial

from mpp_cnn_rs_object_detection_tpu.mpp.energies import EnergyMaps, EnergySpec
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
    build_cache,
    energy_from_cache,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState


@partial(jax.jit, static_argnames=("spec", "n_steps"))
def polish_state(state: PointsState, maps: EnergyMaps, spec: EnergySpec,
                 comb, n_steps: int = 60, lr_xy: float = 0.1,
                 lr_marks: float = 0.003,
                 ) -> Tuple[PointsState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Adam descent on U(xy, marks) with per-step projection.

    Marks are optimised in range-normalised coordinates so one ``lr_marks``
    means the same fraction-of-range step for size/ratio/angle; ``lr_xy`` is
    in pixels. Projection keeps xy inside the maps, size/ratio off their
    degenerate edges, and wraps the cyclic angle. Returns
    ``(best_state, (U_before, U_after))``.
    """
    h, w = maps.position.shape
    vmin, vmax = maps.map_vmin, maps.map_vmax
    rng_m = vmax - vmin
    cyc = maps.map_cyclic

    def project(xy, z):
        xy = jnp.stack(
            [jnp.clip(xy[:, 0], 0.0, h - 1.0),
             jnp.clip(xy[:, 1], 0.0, w - 1.0)], axis=-1
        )
        # cyclic marks wrap; linear marks clip off the degenerate edges
        # (size 0 / ratio 0 collapse the rectangle). The floor must sit
        # BELOW any mapping's bin-0 center (1/(2C) = 0.0156 at C=32) so
        # legitimate smallest-bin marks are not perturbed by projection.
        z = jnp.where(cyc[None, :], jnp.mod(z, 1.0), jnp.clip(z, 0.004, 1.0))
        return xy, z

    def energy(xy, z):
        marks = vmin[None, :] + z * rng_m[None, :]
        st = PointsState(xy=xy, marks=marks, alive=state.alive)
        cache = build_cache(st, maps, spec, safe_dist=True)
        return energy_from_cache(st, maps, spec, comb, cache)

    grad_fn = jax.value_and_grad(energy, argnums=(0, 1))

    xy0 = state.xy.astype(jnp.float32)
    z0 = (state.marks - vmin[None, :]) / rng_m[None, :]
    # u0 and the initial best are the RAW chain state — the "never worsens
    # U" contract is against what the chain actually produced, not a
    # projected copy; projection applies from the first descent step on
    u0 = energy(xy0, z0)

    import optax

    tx_xy = optax.adam(lr_xy)
    tx_z = optax.adam(lr_marks)

    def step(carry, _):
        xy, z, opt_xy, opt_z, best = carry
        best_u, best_xy, best_z = best
        u, (g_xy, g_z) = grad_fn(xy, z)
        # u is the energy AT the incoming iterate — record that pairing
        # before updating, so best_u always matches best_xy/best_z
        better = u < best_u
        best = (
            jnp.where(better, u, best_u),
            jnp.where(better, xy, best_xy),
            jnp.where(better, z, best_z),
        )
        # degenerate geometry (identical quads, zero-length clip edges) can
        # emit NaN cotangents; drop those components rather than poison Adam
        g_xy = jnp.where(jnp.isfinite(g_xy), g_xy, 0.0)
        g_z = jnp.where(jnp.isfinite(g_z), g_z, 0.0)
        up_xy, opt_xy = tx_xy.update(g_xy, opt_xy)
        up_z, opt_z = tx_z.update(g_z, opt_z)
        xy, z = project(optax.apply_updates(xy, up_xy),
                        optax.apply_updates(z, up_z))
        return (xy, z, opt_xy, opt_z, best), u

    init = (xy0, z0, tx_xy.init(xy0), tx_z.init(z0), (u0, xy0, z0))
    (xy_f, z_f, *_, best), _ = jax.lax.scan(
        step, init, None, length=n_steps
    )
    best_u, best_xy, best_z = best
    # the final iterate is itself a candidate
    u_f = energy(xy_f, z_f)
    take_final = u_f < best_u
    out_xy = jnp.where(take_final, xy_f, best_xy)
    out_z = jnp.where(take_final, z_f, best_z)
    out_u = jnp.where(take_final, u_f, best_u)
    marks = vmin[None, :] + out_z * rng_m[None, :]
    return state.replace(xy=out_xy, marks=marks), (u0, out_u)
