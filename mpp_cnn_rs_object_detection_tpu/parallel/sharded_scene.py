"""Exact sharded-scene MPP: ONE global point process over row-sharded maps.

This is the blueprint's "context-parallel" component (SURVEY.md §2.9/§5):
instead of the reference's independent per-tile chains stitched with a
distance-dedup heuristic (``models/mpp/data_loaders.py:122-161`` — border
pair energies simply ignored), the whole scene runs as a single
cell-parallel chain whose state/cache are replicated over the mesh while the
O(H*W*C) energy/sampling maps — the actual memory load — are sharded by rows:

  - each device holds its row band of the detection density, mark
    distributions and energy maps, plus a CELL-row halo exchanged once over
    ICI (``parallel/halo.halo_exchange_rows`` → ``lax.ppermute``);
  - every superstep, all devices see the same jittered global cell grid;
    a device proposes/judges the cells whose midpoint row falls in its band
    (the only map reads a cell needs lie within band ± CELL);
  - the per-cell records (proposal, ΔU, unary energies, accept bit) are
    combined with one masked ``psum`` and applied identically everywhere —
    pair energies across band borders are EXACT because the state is global.

Sharded and single-device runs are bit-identical (same per-cell key
schedule; the psum sums one owner against zeros) — pinned in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import EnergyCombiner
from mpp_cnn_rs_object_detection_tpu.mpp.energies import EnergyMaps, EnergySpec
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import KernelData
from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
    CELL,
    MapView,
    make_parallel_step,
)
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
    ChainStats,
    EnergyCache,
    build_cache,
    energy_from_cache,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import PointsState
from mpp_cnn_rs_object_detection_tpu.parallel.halo import (
    halo_exchange_rows,
    shard_map,
)

AXIS = "rows"


def _scalars_only_maps(maps: EnergyMaps) -> EnergyMaps:
    """EnergyMaps with the big arrays stubbed (1-px) — closed over inside
    shard_map so only the mapping scalars replicate; all real map reads go
    through the device-local MapView."""
    c = maps.mark_maps.shape[-1]
    return maps.replace(
        position=jnp.zeros((1, 1), jnp.float32),
        mark_maps=jnp.zeros((3, 1, 1, c), jnp.float32),
        image=jnp.zeros((1, 1, 3), jnp.float32),
    )


def _scalars_only_kd(kd: KernelData) -> KernelData:
    c = kd.mark_dists.shape[-1]
    return kd.replace(
        birth_cdf=jnp.zeros((1,), jnp.float32),
        log_birth_density=jnp.zeros((1, 1), jnp.float32),
        mark_dists=jnp.zeros((3, 1, 1, c), jnp.float32),
        padded_density=jnp.zeros((1, 1), jnp.float32),
    )


@partial(
    jax.jit,
    static_argnames=("spec", "n_supersteps", "alpha_t", "t_target",
                     "mesh", "hw", "data_moves", "move_switch",
                     "split_merge"),
)
def _sharded_chain(key, init_state: PointsState, cache0: EnergyCache,
                   u0, position, mark_maps, density, mark_dists,
                   maps_sc: EnergyMaps, kd_sc: KernelData, spec: EnergySpec,
                   comb: EnergyCombiner, n_supersteps: int, t0: float,
                   alpha_t: float, t_target: float, mesh: Mesh, hw,
                   data_moves: bool = True, move_switch: bool = False,
                   split_merge: bool = False):
    h, w = hw
    n = mesh.devices.size
    n_cells = max(h, w) // (2 * CELL) + 1

    def body(pos_b, mm_b, den_b, md_b, state, cache, u_in, key_in,
             maps_in, kd_in, comb_in):
        my = jax.lax.axis_index(AXIS)
        band_h = h // n
        row0 = my * band_h - CELL
        pos_ext = halo_exchange_rows(pos_b, CELL, AXIS)
        den_ext = halo_exchange_rows(den_b, CELL, AXIS)
        mm_ext = jnp.moveaxis(
            halo_exchange_rows(jnp.moveaxis(mm_b, 1, 0), CELL, AXIS), 0, 1
        )
        md_ext = jnp.moveaxis(
            halo_exchange_rows(jnp.moveaxis(md_b, 1, 0), CELL, AXIS), 0, 1
        )
        view = MapView(
            cell_density=jnp.pad(den_ext, ((0, 0), (CELL, CELL))),
            mark_dists=md_ext,
            position=pos_ext,
            mark_maps=mm_ext,
            row0_cd=row0,
            row0_md=row0,
        )
        step = make_parallel_step(
            maps_in, spec, comb_in, kd_in, alpha_t, t_target, n_cells,
            view=view, hw=(h, w), axis_name=AXIS, n_bands=n,
            data_moves=data_moves, move_switch=move_switch,
            split_merge=split_merge,
        )
        keys = jax.random.split(key_in, n_supersteps)
        (state, cache, energy, temp), (acc, prop) = jax.lax.scan(
            step, (state, cache, u_in, jnp.asarray(t0, jnp.float32)), keys
        )
        return state, cache, energy, temp, jnp.sum(acc), jnp.sum(prop)

    rows = P(AXIS)
    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(rows, P(None, AXIS), rows, P(None, AXIS), P(), P(), P(),
                  P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P()),
    )
    state, cache, energy, temp, acc, prop = f(
        position, mark_maps, density, mark_dists, init_state, cache0, u0,
        key, maps_sc, kd_sc, comb,
    )
    n_kernels = kd_sc.p_kernels.shape[0]
    stats = ChainStats(
        accepted=jnp.zeros((n_kernels,)).at[0].set(acc.astype(jnp.float32)),
        proposed=jnp.zeros((n_kernels,)).at[0].set(prop.astype(jnp.float32)),
        final_energy=energy,
        final_n_points=state.n_points,
        final_temperature=temp,
    )
    return state, cache, energy, temp, stats


@partial(
    jax.jit,
    static_argnames=("spec", "n_supersteps", "alpha_t", "t_target",
                     "data_moves", "move_switch", "split_merge"),
)
def _local_chain(key, init_state, cache0, u0, maps, kd, spec, comb,
                 n_supersteps, t0, alpha_t, t_target, data_moves=True,
                 move_switch=False, split_merge=False):
    """Single-device whole-scene chain (the mesh=None path), same key
    schedule as the sharded body."""
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
        make_local_view,
    )

    h, w = maps.position.shape
    n_cells = max(h, w) // (2 * CELL) + 1
    step = make_parallel_step(
        maps, spec, comb, kd, alpha_t, t_target, n_cells,
        view=make_local_view(kd, maps), hw=(h, w), data_moves=data_moves,
        move_switch=move_switch, split_merge=split_merge,
    )
    keys = jax.random.split(key, n_supersteps)
    (state, cache, energy, temp), (acc, prop) = jax.lax.scan(
        step, (init_state, cache0, u0, jnp.asarray(t0, jnp.float32)), keys
    )
    return state, cache, energy, temp, jnp.sum(acc), jnp.sum(prop)


def run_exact_scene_chain(key, init_state: PointsState, maps: EnergyMaps,
                          spec: EnergySpec, comb: EnergyCombiner,
                          kd: KernelData, n_supersteps: int, t0: float = 1.0,
                          alpha_t: float = 0.999, t_target: float = 0.0,
                          mesh: Optional[Mesh] = None,
                          cache: Optional[EnergyCache] = None,
                          data_moves: bool = True, move_switch: bool = False,
                          split_merge: bool = False,
                          ) -> Tuple[PointsState, EnergyCache, ChainStats]:
    """Run (a segment of) the exact whole-scene chain, optionally sharded.

    Returns ``(state, cache, stats)``; pass the returned cache back in to
    continue a segmented run without an O(K^2) rebuild. With ``mesh=None``
    (or size 1) this is the plain single-device cell-parallel chain on the
    full maps — bit-identical to the sharded run."""
    h, w = maps.position.shape
    if cache is None:
        cache = build_cache(init_state, maps, spec)
    u0 = energy_from_cache(init_state, maps, spec, comb, cache)

    if mesh is None or mesh.devices.size == 1:
        state, cache, energy, temp, acc, prop = _local_chain(
            key, init_state, cache, u0, maps, kd, spec, comb,
            n_supersteps, t0, alpha_t, t_target, data_moves=data_moves,
            move_switch=move_switch, split_merge=split_merge,
        )
        n_kernels = kd.p_kernels.shape[0]
        stats = ChainStats(
            accepted=jnp.zeros((n_kernels,)).at[0].set(
                acc.astype(jnp.float32)
            ),
            proposed=jnp.zeros((n_kernels,)).at[0].set(
                prop.astype(jnp.float32)
            ),
            final_energy=energy,
            final_n_points=state.n_points,
            final_temperature=temp,
        )
        return state, cache, stats

    n = mesh.devices.size
    assert spec.data_term == "cnn", "sharded scene supports the CNN data term"
    assert h % n == 0, f"scene rows {h} not divisible by mesh size {n}"
    # the band must cover a FULL jittered cell (2*CELL), not just the halo:
    # a cell's jittered origin can place its extent up to 2*CELL from the
    # owning band's midpoint rows. band == CELL was measured to silently
    # diverge from the single-device chain (dryrun probe 2026-08-21:
    # 5 vs 6 detections on an 8-band 256-row scene) — exactness, not an
    # optimization, so this is a hard error
    assert 2 * CELL <= h // n, (
        f"band height {h // n} < 2*CELL ({2 * CELL}): cross-band cells "
        f"would read outside the halo — use fewer devices or a taller scene"
    )

    rows = NamedSharding(mesh, P(AXIS))
    rows1 = NamedSharding(mesh, P(None, AXIS))
    density = jnp.exp(kd.log_birth_density)
    position = jax.device_put(maps.position, rows)
    mark_maps = jax.device_put(maps.mark_maps, rows1)
    density = jax.device_put(density, rows)
    mark_dists = jax.device_put(kd.mark_dists, rows1)

    state, cache, energy, temp, stats = _sharded_chain(
        key, init_state, cache, u0, position, mark_maps, density, mark_dists,
        _scalars_only_maps(maps), _scalars_only_kd(kd), spec, comb,
        n_supersteps, t0, alpha_t, t_target, mesh, (h, w),
        data_moves=data_moves, move_switch=move_switch,
        split_merge=split_merge,
    )
    return state, cache, stats
