"""shard_map halo exchange + exact sharded scene inference.

The reference approximates large scenes by tiling + stitching (SURVEY.md §5
"long-context"): per-tile CNN inference and per-tile chains, deduped at
borders. The TPU-native equivalent shards the scene's rows across the mesh and
exchanges halo strips with ``jax.lax.ppermute`` over ICI so convolutions (and
border pair-energies) are EXACT at shard boundaries — no stitching heuristic.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def shard_map(f, mesh, in_specs, out_specs, **_ignored):
    """jax.shard_map wrapper tolerant to the check_rep->check_vma rename."""
    try:
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a row-sharded block with ``halo`` rows from ring neighbors.

    ``x`` is this device's (H_loc, ...) block; returns (H_loc + 2*halo, ...)
    with the first/last devices zero-padded (scene borders).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)

    top_strip = x[:halo]     # to be sent up (becomes neighbor's bottom halo)
    bot_strip = x[-halo:]    # to be sent down

    # receive from the device above: its bottom strip
    from_above = jax.lax.ppermute(
        bot_strip, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # receive from the device below: its top strip
    from_below = jax.lax.ppermute(
        top_strip, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    zero = jnp.zeros_like(top_strip)
    top_halo = jnp.where(idx == 0, zero, from_above)
    bot_halo = jnp.where(idx == n - 1, zero, from_below)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def sharded_unet_inference(apply_fn: Callable, scene: jnp.ndarray, mesh: Mesh,
                           halo: int = 64, axis_name: str = "data"
                           ) -> jnp.ndarray:
    """Exact multi-device U-Net inference on a row-sharded scene.

    ``apply_fn``: (H, W, C) -> (H, W, C') single-device forward (closed over
    params). Semantics: identical to running ``apply_fn`` on the whole scene
    zero-padded by ``halo`` rows and cropping — i.e. shard borders contribute
    their true neighbor context (exchanged over ICI), and only the scene's
    outer ``halo`` rows see zero padding. ``halo`` must (a) cover the U-Net
    receptive-field radius and (b) be a multiple of 2^depth so pooling grids
    align across shards.
    """

    def wrapped(block):
        padded = halo_exchange_rows(block, halo, axis_name)
        out = apply_fn(padded)
        return out[halo:-halo]

    n = mesh.devices.size
    h = scene.shape[0]
    assert h % n == 0, f"scene H {h} not divisible by {n}"
    h_loc = h // n
    assert halo <= h_loc, (
        f"halo {halo} exceeds the local block height {h_loc} "
        "(single-hop ppermute exchange)"
    )
    assert (h_loc + 2 * halo) % 8 == 0, (
        f"local block {h_loc}+2*{halo} must be a multiple of 8 for the U-Net"
    )
    spec_in = P(axis_name, *([None] * (scene.ndim - 1)))
    scene = jax.device_put(scene, NamedSharding(mesh, spec_in))
    fn = shard_map(
        wrapped, mesh=mesh, in_specs=(spec_in,), out_specs=spec_in,
        check_rep=False,
    )
    return jax.jit(fn)(scene)
