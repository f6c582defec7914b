"""Scene-level MPP inference: tile -> batched chains -> merge -> rescore.

Replaces the reference's one-forked-process-per-tile ``Pool.map(sample_rjmcmc)``
(``mpp_model.py:250-262``) with ONE device launch: all tiles of a scene are
stacked (identical static shapes) and the annealed chains run under a single
``vmap``-of-``scan``. Detections are merged back to scene coordinates with the
reference's distance dedup (keep max papangelou) and rescored globally.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp.combinators import EnergyCombiner
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    EnergyMaps,
    stack_param_dists,
)
from mpp_cnn_rs_object_detection_tpu.mpp.energy_setups import EnergySetup
from mpp_cnn_rs_object_detection_tpu.mpp.image_data import (
    ImageWMaps,
    merge_patch_results,
    split_image,
)
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import KernelData
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
    RJMCMCParams,
    papangelou,
    run_chain,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import (
    PointsState,
    state_from_arrays,
    state_to_arrays,
)
from mpp_cnn_rs_object_detection_tpu.ops.nms import nms_distance
from mpp_cnn_rs_object_detection_tpu.utils.config import maybe_yield_device


def naive_detection(data: ImageWMaps, detection_threshold: float
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Threshold + distance NMS + argmax marks
    (reference ``sample_rjmcmc.py:23-35``)."""
    det = data.detection_map
    centers = np.array(np.where(det >= detection_threshold)).T
    if len(centers) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 3), np.float32)
    scores = det[centers[:, 0], centers[:, 1]]
    nms_centers, _ = nms_distance(centers, scores, threshold=6)
    nms_centers = np.asarray(nms_centers).reshape(-1, 2).astype(int)
    cy, cx = nms_centers[:, 0], nms_centers[:, 1]
    marks = np.stack(
        [
            # bin-CENTER decode (unbiased inverse of the floor encode; the
            # reference's left-edge decode starts chains -step/2 small)
            m.class_to_center_value(np.argmax(d[cy, cx], axis=-1))
            for m, d in zip(data.mappings, data.param_dist_maps)
        ],
        axis=-1,
    ).reshape(-1, 3)
    return nms_centers.astype(np.float32), marks.astype(np.float32)


def pad_image_w_maps(data: ImageWMaps, target: int) -> ImageWMaps:
    """Zero-pad maps (bottom/right) so small images reach the tile size."""
    h, w = data.shape
    ph, pw = max(0, target - h), max(0, target - w)
    if ph == 0 and pw == 0:
        return data
    data.image = np.pad(data.image, ((0, ph), (0, pw), (0, 0)))
    data.detection_map = np.pad(data.detection_map, ((0, ph), (0, pw)))
    data.param_dist_maps = [
        np.pad(p, ((0, ph), (0, pw), (0, 0))) for p in data.param_dist_maps
    ]
    data.shape = data.image.shape[:2]
    return data


def scene_shape_bucket(h0: int, w0: int, n_dev: int = 1):
    """(target_h, target_w) map padding for the exact-scene chain's compile
    cache. Small scenes (tests, crops) quantise at 2*CELL so their padding
    stays proportionate. Real scenes use SQUARE power-of-two-times-256
    buckets so a whole val split shares ONE (H, W, K) program signature —
    each signature costs ~350 s of cold host compile vs ~2 s of chain
    compute at flagship scale, so up to ~4x dead-area compute is the cheap
    side of the trade (the pad region holds zero birth density). E.g. the
    DOTA_gsd50 val scenes (469x753, 926x958, 915x925) all land on
    (1024, 1024) instead of two signatures."""
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import CELL

    quantum = 2 * CELL if (h0 <= 256 and w0 <= 256) else 256
    mult = int(np.lcm(quantum, max(n_dev, 1)))
    target_h = -(-max(h0, 2 * CELL * n_dev) // mult) * mult
    target_w = -(-max(w0, 2 * CELL) // quantum) * quantum
    if quantum == 256:
        side = max(target_h, target_w)
        pow2 = 256
        while pow2 < side:
            pow2 *= 2
        side = -(-pow2 // mult) * mult  # keep mesh divisibility
        target_h = target_w = side
    return target_h, target_w


@dataclass
class SceneResult:
    centers: np.ndarray  # (N, 2)
    marks: np.ndarray    # (N, 3) size/ratio/angle
    scores: np.ndarray   # (N,) papangelou
    n_tiles: int = 1
    total_moves: int = 0


def _stack_states(states: List[PointsState]) -> PointsState:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def run_exact_scene(data: ImageWMaps, setup: EnergySetup, comb: EnergyCombiner,
                    params: RJMCMCParams, seed: int = 0, capacity: int = 256,
                    init: str = "naive", kernel_weights=None,
                    checkpoint_path: Optional[str] = None,
                    segment_size: int = 4096,
                    max_segments: Optional[int] = None,
                    mesh=None, polish_steps: int = 0,
                    restarts: int = 1, stopping=None,
                    data_moves: bool = True,
                    move_switch: bool = False,
                    split_merge: bool = False) -> Optional[SceneResult]:
    """EXACT whole-scene MPP: one global cell-parallel chain over the full
    maps — no tiling, no ``merge_patch_results`` distance-dedup; optionally
    row-sharded over ``mesh`` with halo-exact cross-band pair energies
    (``parallel/sharded_scene.py``). Replaces the reference's tile+dedup
    approximation (``models/mpp/data_loaders.py:122-161``).

    ``restarts``: run N independent annealing chains (vmapped on-device,
    lane key = ``fold_in(segment_key, lane)``) and keep the lowest final
    energy — a best-of-N quality knob the sequential CPU reference can't
    afford (its chains cost minutes each; here extra lanes ride the same
    launch). Single-device only; ignored (with a warning) under a mesh.

    ``stopping``: optional ``mpp.stopping.StoppingCondition`` evaluated on
    the per-segment summaries BETWEEN annealing segments (the XLA-grain
    analog of the reference's per-step stopping,
    ``rjmcmc_sampler/stopping.py:10-146``). When set, every segment syncs to
    the host for its summary; when None the segments dispatch
    asynchronously (checkpoint pulls lag one segment) so the device never
    idles on host I/O.

    ``num_samples`` note: the annealed budget already includes the
    reference's post-burn-in sampling steps (``RJMCMCParams.total_steps =
    burn_in + (n_samples+1)*samples_interval``) and the returned state IS
    the reference's product output — ``mpp_model.py:264`` keeps only the
    LAST collected sample, which is the final state up to
    ``samples_interval`` granularity. Intermediate samples are not
    materialised here (the tiled path collects them); a loud log records
    that when ``n_samples > 1``."""
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import CELL
    from mpp_cnn_rs_object_detection_tpu.parallel.sharded_scene import (
        run_exact_scene_chain,
    )

    n_dev = 1 if mesh is None else int(mesh.devices.size)
    h0, w0 = data.shape
    # pad the maps up to 256-px buckets (any mesh size <= 256 divides the
    # bucketed rows with a CELL-row halo per band). Buckets exist for the
    # compile cache: the chain programs specialise on (H, W, K), scene
    # sizes are arbitrary, and one signature costs ~350 s of host compile —
    # similar scenes should share one executable. Pad cells hold zero
    # detection density (births there are energetically rejected), and the
    # chain itself is ~2 s at flagship scale, so the extra dead-area
    # compute is noise next to one saved compile.
    target_h, target_w = scene_shape_bucket(h0, w0, n_dev)
    data = pad_image_w_maps(data, 1)  # normalise crop_data
    ph = max(0, target_h - data.shape[0])
    pw = max(0, target_w - data.shape[1])
    # the mark maps are the heavy part (~400 MB at flagship scale): transfer
    # them ONCE and pad on device; EnergyMaps and KernelData construction
    # then run as device passes on the shared array instead of a 1-core
    # host spending the scene "prep" stage on numpy copies
    data.param_dist_maps = stack_param_dists(data.param_dist_maps, (ph, pw))
    if ph or pw:
        data.image = np.pad(data.image, ((0, ph), (0, pw), (0, 0)))
        data.detection_map = np.pad(data.detection_map, ((0, ph), (0, pw)))
        data.shape = data.image.shape[:2]
    h, w = data.shape

    t_prep = time.perf_counter()
    if init == "naive":
        c0, m0 = naive_detection(data, setup.detection_threshold)
    elif init == "gt":
        c0, m0 = data.gt_centers, data.gt_marks
    else:
        c0 = np.zeros((0, 2), np.float32)
        m0 = np.zeros((0, 3), np.float32)
    # ``capacity`` is the tiled path's per-256px-tile budget; a global chain
    # must scale slots with scene area or big scenes saturate (births auto-
    # reject once full, and the final population clips at ``capacity``
    # regardless of how many objects the scene holds). 64 slots per tile
    # area keeps the (K, K) pair matrices small while leaving ~2x headroom
    # over observed per-tile populations; the init-growth term still wins
    # for dense small scenes.
    # slots scale with the PADDED area so every scene in a shape bucket also
    # shares the capacity (and therefore the whole program signature); the
    # pad region never births (zero density), so the extra slots only cost
    # (K, K) width, not population
    n_areas = -(-h // 256) * -(-w // 256)
    cap = max(capacity, 64 * n_areas, len(c0) * 3 // 2 + 64)
    cap = int(-(-cap // 64) * 64)
    c0, m0 = c0[:cap], m0[:cap]
    intensity = max(1, len(c0))
    maps = setup.make_maps(data)
    kd = setup.make_kernel_data(data, intensity=intensity,
                                kernel_weights=kernel_weights)
    state = state_from_arrays(c0, m0, capacity=cap)

    n_cells = max(h, w) // (2 * CELL) + 1
    mps = max(1, n_cells * n_cells // 2)  # expected proposals per superstep
    # budget parity with the tiled samplers: ``total_steps`` is the
    # reference's per-256px-tile move budget, so the superstep count is
    # normalised by the proposals a 256px tile area receives per superstep
    # (the tiled-parallel branch's moves_per_superstep), NOT by the whole
    # scene's cell count — otherwise big scenes get starved per-area.
    ms_tile = max(1, (256 // (2 * CELL) + 1) ** 2 // 2)
    total_super = max(1, params.total_steps // ms_tile)
    alpha = params.resolved_alpha()
    alpha_super = float(np.power(alpha, ms_tile))
    t_target = params.resolved_t_target()
    seg_super = max(1, segment_size // ms_tile)
    # round the budget up to whole segments: a shorter remainder segment
    # would compile a SECOND chain program per (shape, K) signature
    # (~350 s host compile each); the extra supersteps anneal at the
    # (clamped) floor temperature — pure extra descent moves
    total_super = -(-total_super // seg_super) * seg_super

    n_restarts = max(1, int(restarts))
    if n_restarts > 1 and mesh is not None and n_dev > 1:
        logging.warning(
            "exact scene: restarts > 1 is single-device only; ignoring"
        )
        n_restarts = 1
    done, t0 = 0, float(params.t0)
    fingerprint = np.array(
        [total_super, seg_super, alpha_super, t_target, cap, h, w,
         n_restarts], np.float64
    )
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if (
            "fingerprint" in ck
            and ck["fingerprint"].shape == fingerprint.shape
            and bool(np.allclose(ck["fingerprint"], fingerprint))
            and int(ck["seed"]) == seed
        ):
            state = PointsState(
                xy=jnp.asarray(ck["xy"]), marks=jnp.asarray(ck["marks"]),
                alive=jnp.asarray(ck["alive"]),
            )
            done, t0 = int(ck["done"]), float(ck["t0"])
            logging.info(
                f"scene {data.name}: resuming exact chain at superstep {done}"
            )
        else:
            logging.warning(
                f"scene {data.name}: exact checkpoint mismatch — restarting"
            )
    base_key = jax.random.PRNGKey(seed)
    if n_restarts > 1 and state.xy.ndim == 2:
        # broadcast the shared init over the restart lanes (a resumed
        # checkpoint is already batched — its fingerprint pinned n_restarts)
        state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_restarts,) + x.shape), state
        )
    cache = None
    stats = None
    segments_run = 0
    seg_times = []
    summaries = []
    if params.n_samples > 1:
        logging.info(
            f"scene {data.name}: exact mode runs the full sampled budget "
            f"({params.n_samples} samples x {params.resolved_interval}-move "
            "interval included) but materialises only the final state — the "
            "reference's product output is the LAST sample (mpp_model.py:264)"
        )
    # stopping needs per-segment host summaries; without it segments
    # dispatch asynchronously and checkpoint pulls lag one segment, so the
    # host writes checkpoint i while the device runs segment i+1
    sync_each = stopping is not None

    def _checkpoint(st, done_v, t0_v):
        np.savez(
            checkpoint_path, xy=np.asarray(st.xy), marks=np.asarray(st.marks),
            alive=np.asarray(st.alive), done=done_v, t0=t0_v, seed=seed,
            fingerprint=fingerprint,
        )

    pending_ck = None  # (state, done, t0) of the previous segment
    t_prep = time.perf_counter() - t_prep
    t_chain = time.perf_counter()
    while done < total_super:
        t_seg = time.perf_counter()
        n = min(seg_super, total_super - done)
        seg_key = jax.random.fold_in(base_key, done)
        if n_restarts == 1:
            state, cache, stats = run_exact_scene_chain(
                seg_key, state, maps, setup.spec,
                comb, kd, n_supersteps=n, t0=t0, alpha_t=alpha_super,
                t_target=t_target, mesh=mesh, cache=cache,
                data_moves=data_moves, move_switch=move_switch,
                split_merge=split_merge,
            )
        else:
            lane_keys = jax.vmap(
                lambda i: jax.random.fold_in(seg_key, i)
            )(jnp.arange(n_restarts))

            def _one(k, st, ca=None):
                return run_exact_scene_chain(
                    k, st, maps, setup.spec, comb, kd, n_supersteps=n,
                    t0=t0, alpha_t=alpha_super, t_target=t_target,
                    mesh=None, cache=ca, data_moves=data_moves,
                    move_switch=move_switch, split_merge=split_merge,
                )

            if cache is None:
                state, cache, stats = jax.vmap(_one)(lane_keys, state)
            else:
                state, cache, stats = jax.vmap(_one)(lane_keys, state, cache)
        done += n
        t0 = max(float(t0 * alpha_super**n), t_target)
        segments_run += 1
        stop_now = False
        if sync_each:
            jax.block_until_ready(stats.final_energy)
            seg_times.append(time.perf_counter() - t_seg)
            from mpp_cnn_rs_object_detection_tpu.mpp.stopping import (
                SegmentSummary,
            )

            acc = float(np.sum(np.asarray(stats.accepted)))
            nprop = float(np.sum(np.asarray(stats.proposed)))
            summaries.append(SegmentSummary(
                iter=done * mps,
                energy=float(np.mean(np.asarray(stats.final_energy))),
                n_points=int(np.max(np.asarray(stats.final_n_points))),
                temperature=t0,
                accept_rate=acc / max(nprop, 1.0),
                seconds=seg_times[-1],
            ))
            stop_now = done < total_super and stopping.do_stop(summaries)
        else:
            # async device->host pulls: materialising these arrays for the
            # checkpoint write below blocks only on THIS segment's results
            # while the next segment already runs
            for leaf in jax.tree_util.tree_leaves(state):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
            seg_times.append(time.perf_counter() - t_seg)
        if checkpoint_path and done < total_super and not stop_now:
            if sync_each:
                _checkpoint(state, done, t0)
            else:
                if pending_ck is not None:
                    _checkpoint(*pending_ck)
                pending_ck = (state, done, t0)
            maybe_yield_device(f"scene {data.name} segment {segments_run}")
        if stop_now:
            s = summaries[-1]
            logging.info(
                f"scene {data.name}: stopping fired at superstep "
                f"{done}/{total_super} (E={s.energy:.2f} "
                f"acc={s.accept_rate:.4f} T={s.temperature:.4g})"
            )
            break
        if (
            max_segments is not None
            and segments_run >= max_segments
            and done < total_super
        ):
            if not sync_each and checkpoint_path:
                _checkpoint(state, done, t0)  # latest, not the lagging one
            return None  # simulated crash mid-anneal
    jax.block_until_ready(stats.final_energy)
    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    if summaries:
        # ChainTimer-style per-segment splits (reference RJMCMCTimer /
        # RJMCMC.run(show_timing), rjmcmc.py:18-48,172-181)
        from mpp_cnn_rs_object_detection_tpu.mpp.stopping import ChainTimer

        timer = ChainTimer()
        timer.extend(summaries)
        logging.info(f"scene {data.name} segments:\n" + timer.show_results())

    t_chain = time.perf_counter() - t_chain
    t_score = time.perf_counter()
    if n_restarts > 1 and state.xy.ndim == 3:
        if stats is not None:
            u_fin = np.asarray(stats.final_energy).reshape(-1)
        else:
            # no segment ran this process (resume landed at the end):
            # lanes diverged before the checkpoint, so recompute each
            # lane's energy rather than picking one arbitrarily
            from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
                build_cache,
                energy_from_cache,
            )

            def _lane_u(st):
                ca = build_cache(st, maps, setup.spec)
                return energy_from_cache(st, maps, setup.spec, comb, ca)

            u_fin = np.asarray(jax.vmap(_lane_u)(state)).reshape(-1)
        best = int(np.argmin(u_fin))
        logging.info(
            f"scene {data.name}: best-of-{n_restarts} restarts — "
            f"energies {np.round(u_fin, 2).tolist()} -> lane {best}"
        )
        state = jax.tree_util.tree_map(lambda x: x[best], state)
    if polish_steps > 0:
        from mpp_cnn_rs_object_detection_tpu.mpp.polish import polish_state

        state, (u_pre, u_post) = polish_state(
            state, maps, setup.spec, comb, n_steps=int(polish_steps)
        )
        logging.info(
            f"scene {data.name}: polish {polish_steps} steps "
            f"U {float(u_pre):.2f} -> {float(u_post):.2f}"
        )
    scores_k = np.asarray(papangelou(state, maps, setup.spec, comb))
    xy, marks = state_to_arrays(state)
    alive = np.asarray(state.alive)
    seg_detail = ""
    if seg_times:
        # sync mode: first-launch time is compile unless the executable was
        # cached; async mode: these are dispatch times (device overlaps)
        kind_s = "sync" if sync_each else "dispatch"
        seg_detail = (
            f" ({kind_s} first={seg_times[0]:.1f}s "
            f"median={float(np.median(seg_times)):.1f}s x{len(seg_times)})"
        )
    logging.info(
        f"scene {data.name}: exact chain {done} supersteps x ~{mps} "
        f"cells (K={cap}, {n_dev} device(s)) -> {len(xy)} detections "
        f"[prep={t_prep:.1f}s segments={t_chain:.1f}s{seg_detail} "
        f"papangelou={time.perf_counter() - t_score:.1f}s]"
    )
    centers_np = np.asarray(xy).reshape(-1, 2)
    marks_np = np.asarray(marks).reshape(-1, 3)
    scores_np = scores_k[alive].reshape(-1)
    # with the square pow2 buckets the dead pad area can be large; births
    # there are density-zero and translations into it are repelled by the
    # position energy, but any straggler would be scored against zero maps —
    # keep only detections whose center lies in the original scene extent
    keep = (
        (centers_np[:, 0] < h0) & (centers_np[:, 1] < w0)
        & (centers_np >= 0).all(axis=1)
    )
    return SceneResult(
        centers=centers_np[keep],
        marks=marks_np[keep],
        scores=scores_np[keep],
        n_tiles=n_dev,
        total_moves=done * mps,
    )


def run_mpp_on_scene(data: ImageWMaps, setup: EnergySetup, comb: EnergyCombiner,
                     params: RJMCMCParams, seed: int = 0, patch_size: int = 256,
                     min_overlap: int = 32, capacity: int = 256,
                     init: str = "naive", kernel_weights=None,
                     use_split_merge: bool = False,
                     sampler: str = "sequential",
                     scene_mode: str = "tiled",
                     checkpoint_path: Optional[str] = None,
                     segment_size: int = 4096,
                     max_segments: Optional[int] = None,
                     max_tiles_per_launch: int = 12,
                     mesh=None, polish_steps: int = 0,
                     restarts: int = 1, stopping=None,
                     data_moves: bool = True,
                     move_switch: bool = False,
                     split_merge: bool = False) -> Optional[SceneResult]:
    """Full-scene MPP inference (reference ``mpp_model.py:202-321`` infer body).

    ``checkpoint_path``: optional ``.npz`` the sequential sampler writes after
    every annealing segment (all tiles' states + temperature + step count) and
    resumes from if present — the reference's chains are not checkpointable
    (SURVEY §5); here a killed scene run loses at most one segment
    (``segment_size`` moves). The file is removed on completion.

    ``max_segments``: fault-injection hook — abort (returning None) after that
    many annealing segments, as a killed process would; tests resume from the
    checkpoint left behind.

    ``mesh``: optional ``jax.sharding.Mesh`` — shard the stacked tile batch
    over its devices (tile-data-parallel, the multi-chip analog of the
    reference's one-process-per-tile ``Pool.map``). Tiles of one scene are
    independent chains, so GSPMD partitions the vmapped sampler with zero
    collectives; the tile axis is padded to a multiple of the mesh size.
    Results are bit-identical to the unsharded run (same per-tile keys).

    ``scene_mode='exact'``: skip tiling entirely — one global cell-parallel
    chain over the whole scene (optionally row-sharded over ``mesh`` with
    halo-exact borders); see ``run_exact_scene``.
    """
    if scene_mode == "exact":
        return run_exact_scene(
            data, setup, comb, params, seed=seed, capacity=capacity,
            init=init, kernel_weights=kernel_weights,
            checkpoint_path=checkpoint_path, segment_size=segment_size,
            max_segments=max_segments, mesh=mesh, polish_steps=polish_steps,
            restarts=restarts, stopping=stopping, data_moves=data_moves,
            move_switch=move_switch, split_merge=split_merge,
        )
    if stopping is not None:
        logging.warning(
            "stopping conditions are evaluated on exact-scene segments only; "
            "ignored in tiled mode"
        )
    data = pad_image_w_maps(data, patch_size)
    patches = split_image(data, patch_size, min_overlap)

    maps_list, kd_list, init_list = [], [], []
    for p in patches:
        if init == "naive":
            c0, m0 = naive_detection(p, setup.detection_threshold)
        elif init == "gt":
            c0, m0 = p.gt_centers, p.gt_marks
        else:
            c0 = np.zeros((0, 2), np.float32)
            m0 = np.zeros((0, 3), np.float32)
        c0, m0 = c0[:capacity], m0[:capacity]
        intensity = max(1, len(c0))
        maps_list.append(setup.make_maps(p))
        kd_list.append(
            setup.make_kernel_data(p, intensity=intensity,
                                   kernel_weights=kernel_weights,
                                   use_split_merge=use_split_merge)
        )
        init_list.append(state_from_arrays(c0, m0, capacity=capacity))

    maps_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *maps_list)
    kd_b = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *kd_list)
    init_b = _stack_states(init_list)
    n_tiles = len(patches)
    n_batch = n_tiles
    put = lambda t: t  # noqa: E731 — identity without a mesh
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_batch = n_tiles + (-n_tiles) % mesh.size
        if n_batch > n_tiles:
            pad_n = n_batch - n_tiles

            def dup_last(x):
                return jnp.concatenate(
                    [x, jnp.repeat(x[-1:], pad_n, axis=0)], axis=0
                )

            maps_b = jax.tree_util.tree_map(dup_last, maps_b)
            kd_b = jax.tree_util.tree_map(dup_last, kd_b)
            init_b = jax.tree_util.tree_map(dup_last, init_b)
        sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names))

        def put(t):  # noqa: F811
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), t
            )

        maps_b, kd_b, init_b = put(maps_b), put(kd_b), put(init_b)
    keys = put(jax.random.split(jax.random.PRNGKey(seed), n_batch))

    alpha = params.resolved_alpha()
    t_target = params.resolved_t_target()
    spec = setup.spec
    n_samp = max(0, int(params.n_samples))

    if sampler == "parallel":
        # cell-parallel supersteps: same move budget in far fewer device
        # steps (each superstep proposes ~(patch/(2*CELL)+1)^2 moves).
        # Post-burn-in sample collection is a sequential-sampler feature; the
        # parallel sampler returns its annealed final state.
        from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
            CELL,
            run_parallel_chain,
        )

        moves_per_superstep = max(1, (patch_size // (2 * CELL) + 1) ** 2 // 2)
        alpha_super = float(np.power(alpha, moves_per_superstep))
        n_samp = 0

        def one_tile(key, st, maps, kd, n_steps, t0, offset):
            final, stats = run_parallel_chain(
                key, st, maps, spec, comb, kd,
                n_supersteps=n_steps, t0=t0,
                alpha_t=alpha_super, t_target=t_target,
                data_moves=data_moves, move_switch=move_switch,
                split_merge=split_merge,
            )
            scores = papangelou(final, maps, spec, comb)
            empty = jnp.zeros((0,), jnp.int32)
            return final, scores, stats, empty, jnp.asarray(0, jnp.int32)

        # steps are counted in supersteps below
        total = max(1, params.total_steps // moves_per_superstep)
        seg = max(1, segment_size // moves_per_superstep)
        alpha_per_step = alpha_super
    else:

        def one_tile(key, st, maps, kd, n_steps, t0, offset):
            if n_samp > 0:
                final, stats, samples, n_coll = run_chain(
                    key, st, maps, spec, comb, kd,
                    n_steps=n_steps, t0=t0,
                    alpha_t=alpha, t_target=t_target,
                    n_samples=n_samp,
                    samples_interval=params.resolved_interval,
                    burn_in=params.burn_in, step_offset=offset,
                )
            else:
                final, stats = run_chain(
                    key, st, maps, spec, comb, kd,
                    n_steps=n_steps, t0=t0,
                    alpha_t=alpha, t_target=t_target,
                )
                samples = jnp.zeros((0,), jnp.int32)
                n_coll = jnp.asarray(0, jnp.int32)
            scores = papangelou(final, maps, spec, comb)
            return final, scores, stats, samples, n_coll

        total = params.total_steps
        seg = segment_size
        alpha_per_step = alpha

    # segment the annealing schedule AND chunk the tile axis: one giant
    # scan x wide tile-vmap crashes the (experimental) axon TPU worker
    # (a single 25-tile x 4096-move launch faults it reproducibly, while
    # 12-tile launches survive); several narrower, shorter launches with
    # the temperature threaded through are equivalent. Chain state lives
    # host-side between launches so a worker crash loses at most one
    # segment of one chunk.
    chunk = max(1, max_tiles_per_launch)
    if mesh is not None:
        # keep every launch's tile axis divisible by the mesh
        chunk = max(mesh.size, chunk - chunk % mesh.size)
    n_chunks = -(-n_batch // chunk)
    # writable host copies (np.asarray of a jax array is read-only)
    xy_h = np.array(init_b.xy)
    marks_h = np.array(init_b.marks)
    alive_h = np.array(init_b.alive)
    scores_h = np.zeros(alive_h.shape, np.float32)
    done_arr = np.zeros(n_chunks, np.int64)
    t0_arr = np.full(n_chunks, float(params.t0))
    # rolling post-burn-in sample buffers (valid entries at the END,
    # oldest -> newest — the run_chain convention)
    s_xy = np.zeros((n_batch, n_samp) + xy_h.shape[1:], np.float32)
    s_marks = np.zeros((n_batch, n_samp) + marks_h.shape[1:], np.float32)
    s_alive = np.zeros((n_batch, n_samp) + alive_h.shape[1:], bool)
    s_count = np.zeros(n_batch, np.int64)
    # reject checkpoints from a different chain configuration: resuming with
    # changed annealing params silently mixes schedules otherwise
    fingerprint = np.array([
        total, seg, float(alpha_per_step), float(t_target),
        init_b.xy.shape[-2], n_samp, params.resolved_interval,
    ], np.float64)
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if (
            int(ck["n_tiles"]) == n_tiles
            and int(ck["seed"]) == seed
            and ck["xy"].shape[0] == n_batch
            and ck["done"].shape == (n_chunks,)
            and int(ck["done"].min()) < total
            and "fingerprint" in ck
            and ck["fingerprint"].shape == fingerprint.shape
            and bool(np.allclose(ck["fingerprint"], fingerprint))
        ):
            xy_h, marks_h = ck["xy"].copy(), ck["marks"].copy()
            alive_h = ck["alive"].copy()
            scores_h = ck["scores"].copy()
            done_arr = ck["done"].copy()
            t0_arr = ck["t0"].copy()
            if "s_count" in ck and ck["s_xy"].shape == s_xy.shape:
                s_xy, s_marks = ck["s_xy"].copy(), ck["s_marks"].copy()
                s_alive, s_count = ck["s_alive"].copy(), ck["s_count"].copy()
            logging.info(
                f"scene {data.name}: resuming chains at moves "
                f"{done_arr.tolist()}"
            )
        elif "fingerprint" not in ck or not bool(
            np.allclose(ck.get("fingerprint", np.zeros(0)), fingerprint)
        ):
            logging.warning(
                f"scene {data.name}: checkpoint params mismatch — restarting"
            )
    segments_run = 0
    base_key = jax.random.PRNGKey(seed)
    for ci in range(n_chunks):
        if done_arr[ci] >= total:
            continue
        sl = slice(ci * chunk, min((ci + 1) * chunk, n_batch))
        maps_c = jax.tree_util.tree_map(lambda x: x[sl], maps_b)
        kd_c = jax.tree_util.tree_map(lambda x: x[sl], kd_b)
        states_c = put(PointsState(
            xy=jnp.asarray(xy_h[sl]), marks=jnp.asarray(marks_h[sl]),
            alive=jnp.asarray(alive_h[sl]),
        ))
        while done_arr[ci] < total:
            done, t0 = int(done_arr[ci]), float(t0_arr[ci])
            n = min(seg, total - done)
            # same key schedule as an unchunked run: split over the full
            # tile batch, take this chunk's slice
            key_seg = put(jax.random.split(
                jax.random.fold_in(base_key, done), n_batch
            )[sl])
            states_c, scores_c, stats, samples_c, ncoll_c = jax.vmap(
                lambda k, st, m, kd_: one_tile(
                    k, st, m, kd_, n, t0, jnp.asarray(done, jnp.int32)
                )
            )(key_seg, states_c, maps_c, kd_c)
            done_arr[ci] = done + n
            t0_arr[ci] = max(float(t0 * alpha_per_step**n), t_target)
            xy_h[sl] = np.asarray(states_c.xy)
            marks_h[sl] = np.asarray(states_c.marks)
            alive_h[sl] = np.asarray(states_c.alive)
            scores_h[sl] = np.asarray(scores_c)
            if n_samp > 0:
                ncoll_np = np.asarray(ncoll_c)
                if ncoll_np.max() > 0:
                    seg_xy = np.asarray(samples_c.xy)
                    seg_marks = np.asarray(samples_c.marks)
                    seg_alive = np.asarray(samples_c.alive)
                    for j in range(seg_xy.shape[0]):
                        g = sl.start + j
                        v_new = min(int(ncoll_np[j]), n_samp)
                        if v_new == 0:
                            continue
                        v_old = min(int(s_count[g]), n_samp)
                        cat = lambda h, s_: np.concatenate(
                            [h[g, n_samp - v_old:] if v_old else h[g, :0],
                             s_[j, n_samp - v_new:]], axis=0
                        )[-n_samp:]
                        kept_xy = cat(s_xy, seg_xy)
                        kept_marks = cat(s_marks, seg_marks)
                        kept_alive = cat(s_alive, seg_alive)
                        kv = kept_xy.shape[0]
                        s_xy[g, n_samp - kv:] = kept_xy
                        s_marks[g, n_samp - kv:] = kept_marks
                        s_alive[g, n_samp - kv:] = kept_alive
                        s_count[g] += int(ncoll_np[j])
            segments_run += 1
            finished = bool((done_arr >= total).all())
            if checkpoint_path and not finished:
                np.savez(
                    checkpoint_path, xy=xy_h, marks=marks_h,
                    alive=alive_h, scores=scores_h, done=done_arr,
                    t0=t0_arr, n_tiles=n_tiles, seed=seed,
                    fingerprint=fingerprint, s_xy=s_xy, s_marks=s_marks,
                    s_alive=s_alive, s_count=s_count,
                )
                maybe_yield_device(f"tile chunk segment {segments_run}")
            if (
                max_segments is not None
                and segments_run >= max_segments
                and not finished
            ):
                return None  # simulated crash mid-anneal
    if n_samp > 0 and s_count.max() > 0:
        # parity with the reference's ``return last_state[-num_samples:]``
        # + ``results = [r[-1] ...]`` (sample_rjmcmc.py:99-102,
        # mpp_model.py:264): the merged tile state is the LAST collected
        # sample, rescored; tiles that never hit a sampling step (short
        # custom schedules) keep their final annealed state.
        sampled = s_count > 0
        xy_h = np.where(sampled[:, None, None], s_xy[:, -1], xy_h)
        marks_h = np.where(sampled[:, None, None], s_marks[:, -1], marks_h)
        alive_h = np.where(sampled[:, None], s_alive[:, -1], alive_h)
        for ci in range(n_chunks):
            sl = slice(ci * chunk, min((ci + 1) * chunk, n_batch))
            if not np.any(sampled[sl]):
                continue
            maps_c = jax.tree_util.tree_map(lambda x: x[sl], maps_b)
            st_c = put(PointsState(
                xy=jnp.asarray(xy_h[sl]), marks=jnp.asarray(marks_h[sl]),
                alive=jnp.asarray(alive_h[sl]),
            ))
            scores_h[sl] = np.asarray(jax.vmap(
                lambda st, m: papangelou(st, m, spec, comb)
            )(st_c, maps_c))
    finals = PointsState(xy=xy_h, marks=marks_h, alive=alive_h)
    scores_b = scores_h
    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)

    # host-side merge
    centers_list, marks_list, scores_list = [], [], []
    for t in range(n_tiles):
        st_t = jax.tree_util.tree_map(lambda x: x[t], finals)
        xy, marks = state_to_arrays(st_t)
        alive = np.asarray(st_t.alive)
        centers_list.append(xy)
        marks_list.append(marks)
        scores_list.append(np.asarray(scores_b[t])[alive])
    centers, marks, scores = merge_patch_results(
        patches, centers_list, marks_list, scores_list, distance=3.0
    )

    # global papangelou rescoring on the full-scene maps
    if len(centers) > 0:
        scene_maps = setup.make_maps(data)
        # bucket K to a multiple of 64: the polish/papangelou programs
        # specialise on capacity, and detection counts vary run to run —
        # exact-K capacities would recompile (~minutes on this host) for
        # every count, where buckets hit the persistent compile cache
        cap_b = -(-max(len(centers), 1) // 64) * 64
        scene_state = state_from_arrays(centers, marks, capacity=cap_b)
        if polish_steps > 0:
            from mpp_cnn_rs_object_detection_tpu.mpp.polish import (
                polish_state,
            )

            scene_state, (u_pre, u_post) = polish_state(
                scene_state, scene_maps, spec, comb,
                n_steps=int(polish_steps),
            )
            centers, marks = state_to_arrays(scene_state)
            logging.info(
                f"scene {data.name}: polish {polish_steps} steps "
                f"U {float(u_pre):.2f} -> {float(u_post):.2f}"
            )
        scores = np.asarray(
            papangelou(scene_state, scene_maps, spec, comb)
        )[: len(centers)]

    logging.info(
        f"scene {data.name}: {n_tiles} tiles x {params.total_steps} moves -> "
        f"{len(centers)} detections"
    )
    return SceneResult(
        centers=np.asarray(centers).reshape(-1, 2),
        marks=np.asarray(marks).reshape(-1, 3),
        scores=np.asarray(scores).reshape(-1),
        n_tiles=n_tiles,
        total_moves=n_tiles * params.total_steps,
    )


def run_exact_scenes_batched(
    datas: List[ImageWMaps], setup: EnergySetup, comb: EnergyCombiner,
    params: RJMCMCParams, seeds: List[int], capacity: int = 256,
    init: str = "naive", kernel_weights=None,
    checkpoint_path: Optional[str] = None, segment_size: int = 4096,
    polish_steps: int = 0, mesh=None, stopping=None,
    data_moves: bool = True, move_switch: bool = False,
    split_merge: bool = False,
) -> List[SceneResult]:
    """EXACT whole-scene MPP over a BATCH of scenes in one device program.

    Scenes padded to one shape bucket share a single (H, W, K) program
    signature (``scene_shape_bucket``), so their chains vmap into one launch:
    at flagship scale the cell-parallel superstep is launch/overhead-bound
    (measured ~20x off the HBM roofline), and batching the val split
    multiplies active cells per launch at near-constant launch cost.

    Key schedule parity: scene i uses ``PRNGKey(seeds[i])`` folded per
    segment exactly as ``run_exact_scene`` does — a batched run is
    BIT-IDENTICAL to per-scene sequential runs at equal capacity
    (pinned by ``tests/test_batched_scenes.py``).

    ``mesh``: optional 1-axis ``jax.sharding.Mesh`` — scenes are
    independent chains, so the batch axis shards over its devices with
    ZERO collectives (GSPMD partitions the vmapped program trivially;
    results stay bit-identical). Uses the first ``B % n == 0`` prefix of
    the mesh; restarts/row-sharding remain the per-scene path's domain."""
    from mpp_cnn_rs_object_detection_tpu.parallel.sharded_scene import (
        run_exact_scene_chain,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import CELL

    assert len(datas) > 0
    t_prep = time.perf_counter()
    # one shared bucket covering every scene
    shapes = [d.shape for d in datas]
    target_h = max(scene_shape_bucket(h, w, 1)[0] for h, w in shapes)
    target_w = max(scene_shape_bucket(h, w, 1)[1] for h, w in shapes)
    orig_hw = []
    inits = []
    caps = []
    for data in datas:
        orig_hw.append(tuple(data.shape))
        pad_image_w_maps(data, 1)
        ph = max(0, target_h - data.shape[0])
        pw = max(0, target_w - data.shape[1])
        data.param_dist_maps = stack_param_dists(
            data.param_dist_maps, (ph, pw)
        )
        if ph or pw:
            data.image = np.pad(data.image, ((0, ph), (0, pw), (0, 0)))
            data.detection_map = np.pad(
                data.detection_map, ((0, ph), (0, pw))
            )
            data.shape = data.image.shape[:2]
        if init == "naive":
            c0, m0 = naive_detection(data, setup.detection_threshold)
        elif init == "gt":
            c0, m0 = data.gt_centers, data.gt_marks
        else:
            c0 = np.zeros((0, 2), np.float32)
            m0 = np.zeros((0, 3), np.float32)
        inits.append((c0, m0))
        n_areas = -(-target_h // 256) * -(-target_w // 256)
        cap_i = max(capacity, 64 * n_areas, len(c0) * 3 // 2 + 64)
        caps.append(int(-(-cap_i // 64) * 64))
    cap = max(caps)  # shared K: the batch stacks one static shape
    h, w = target_h, target_w

    states = [
        state_from_arrays(c0[:cap], m0[:cap], capacity=cap)
        for c0, m0 in inits
    ]
    state = _stack_states(states)
    maps_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[setup.make_maps(d) for d in datas]
    )
    kd_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[
            setup.make_kernel_data(
                d, intensity=max(1, len(c0)),
                kernel_weights=kernel_weights,
            )
            for d, (c0, _) in zip(datas, inits)
        ],
    )

    shard_batch = None
    if mesh is not None and int(mesh.devices.size) > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        n_dev = int(mesh.devices.size)
        b = len(datas)
        n_use = max(d for d in range(1, min(n_dev, b) + 1) if b % d == 0)
        if n_use > 1:
            axis = mesh.axis_names[0]
            sub = Mesh(mesh.devices.reshape(-1)[:n_use], (axis,))
            sharding = NamedSharding(sub, P(axis))

            def shard_batch(tree):  # noqa: F811 — closure, not reassign
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), tree
                )

            state = shard_batch(state)
            maps_b = shard_batch(maps_b)
            kd_b = shard_batch(kd_b)
            logging.info(
                f"batched scenes: sharding {b} scenes over {n_use} devices"
            )

    # identical budget math to run_exact_scene (shared bucket => shared)
    n_cells = max(h, w) // (2 * CELL) + 1
    mps = max(1, n_cells * n_cells // 2)
    ms_tile = max(1, (256 // (2 * CELL) + 1) ** 2 // 2)
    total_super = max(1, params.total_steps // ms_tile)
    alpha = params.resolved_alpha()
    alpha_super = float(np.power(alpha, ms_tile))
    t_target = params.resolved_t_target()
    seg_super = max(1, segment_size // ms_tile)
    total_super = -(-total_super // seg_super) * seg_super

    base_keys = [jax.random.PRNGKey(s) for s in seeds]
    done, t0 = 0, float(params.t0)
    fingerprint = np.array(
        [total_super, seg_super, alpha_super, t_target, cap, h, w,
         len(datas)] + list(seeds), np.float64
    )
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if (
            "fingerprint" in ck
            and ck["fingerprint"].shape == fingerprint.shape
            and bool(np.allclose(ck["fingerprint"], fingerprint))
        ):
            state = PointsState(
                xy=jnp.asarray(ck["xy"]), marks=jnp.asarray(ck["marks"]),
                alive=jnp.asarray(ck["alive"]),
            )
            if shard_batch is not None:
                state = shard_batch(state)
            done, t0 = int(ck["done"]), float(ck["t0"])
            logging.info(
                f"batched scenes: resuming at superstep {done}"
            )
        else:
            logging.warning("batched scenes: checkpoint mismatch — restart")

    spec = setup.spec
    cache = None
    stats = None
    seg_times = []
    summaries = []
    sync_each = stopping is not None  # joint stop over the whole batch

    def _checkpoint(st, done_v, t0_v):
        np.savez(
            checkpoint_path, xy=np.asarray(st.xy),
            marks=np.asarray(st.marks), alive=np.asarray(st.alive),
            done=done_v, t0=t0_v, fingerprint=fingerprint,
        )

    pending_ck = None
    t_prep = time.perf_counter() - t_prep
    t_chain = time.perf_counter()
    while done < total_super:
        t_seg = time.perf_counter()
        n = min(seg_super, total_super - done)
        seg_keys = jnp.stack(
            [jax.random.fold_in(k, done) for k in base_keys]
        )
        if shard_batch is not None:
            seg_keys = shard_batch(seg_keys)

        def _one(k, st, mp, kd_, ca=None):
            return run_exact_scene_chain(
                k, st, mp, spec, comb, kd_, n_supersteps=n,
                t0=t0, alpha_t=alpha_super, t_target=t_target,
                mesh=None, cache=ca, data_moves=data_moves,
                move_switch=move_switch, split_merge=split_merge,
            )

        if cache is None:
            state, cache, stats = jax.vmap(_one)(
                seg_keys, state, maps_b, kd_b
            )
        else:
            state, cache, stats = jax.vmap(_one)(
                seg_keys, state, maps_b, kd_b, cache
            )
        done += n
        t0 = max(float(t0 * alpha_super**n), t_target)
        stop_now = False
        if sync_each:
            jax.block_until_ready(stats.final_energy)
            seg_times.append(time.perf_counter() - t_seg)
            from mpp_cnn_rs_object_detection_tpu.mpp.stopping import (
                SegmentSummary,
            )

            acc = float(np.sum(np.asarray(stats.accepted)))
            nprop = float(np.sum(np.asarray(stats.proposed)))
            summaries.append(SegmentSummary(
                iter=done * mps,
                energy=float(np.mean(np.asarray(stats.final_energy))),
                n_points=int(np.max(np.asarray(stats.final_n_points))),
                temperature=t0,
                accept_rate=acc / max(nprop, 1.0),
                seconds=seg_times[-1],
            ))
            stop_now = done < total_super and stopping.do_stop(summaries)
        else:
            for leaf in jax.tree_util.tree_leaves(state):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
            seg_times.append(time.perf_counter() - t_seg)
        if checkpoint_path and done < total_super and not stop_now:
            if sync_each:
                _checkpoint(state, done, t0)
            else:
                if pending_ck is not None:
                    _checkpoint(*pending_ck)
                pending_ck = (state, done, t0)
            maybe_yield_device(f"batched scenes superstep {done}")
        if stop_now:
            logging.info(
                f"batched scenes: stopping fired at superstep "
                f"{done}/{total_super}"
            )
            break
    jax.block_until_ready(stats.final_energy)
    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    t_chain = time.perf_counter() - t_chain

    t_score = time.perf_counter()
    scores_b = np.asarray(
        jax.vmap(lambda st, mp: papangelou(st, mp, spec, comb))(
            state, maps_b
        )
    )
    results = []
    for i, data in enumerate(datas):
        st_i = jax.tree_util.tree_map(lambda x: x[i], state)
        if polish_steps > 0:
            from mpp_cnn_rs_object_detection_tpu.mpp.polish import (
                polish_state,
            )

            maps_i = jax.tree_util.tree_map(lambda x: x[i], maps_b)
            st_i, (u_pre, u_post) = polish_state(
                st_i, maps_i, spec, comb, n_steps=int(polish_steps)
            )
            sc_i = np.asarray(papangelou(st_i, maps_i, spec, comb))
        else:
            sc_i = scores_b[i]
        xy, marks = state_to_arrays(st_i)
        alive = np.asarray(st_i.alive)
        centers_np = np.asarray(xy).reshape(-1, 2)
        marks_np = np.asarray(marks).reshape(-1, 3)
        scores_np = sc_i[alive].reshape(-1)
        h0, w0 = orig_hw[i]
        keep = (
            (centers_np[:, 0] < h0) & (centers_np[:, 1] < w0)
            & (centers_np >= 0).all(axis=1)
        )
        results.append(
            SceneResult(
                centers=centers_np[keep], marks=marks_np[keep],
                scores=scores_np[keep], n_tiles=1,
                total_moves=done * mps,
            )
        )
    seg_detail = ""
    if seg_times:
        seg_detail = (
            f" (first={seg_times[0]:.1f}s "
            f"median={float(np.median(seg_times)):.1f}s x{len(seg_times)})"
        )
    logging.info(
        f"batched scenes x{len(datas)}: exact chains {done} "
        f"supersteps x ~{mps} cells each (K={cap}) "
        f"[prep={t_prep:.1f}s segments={t_chain:.1f}s{seg_detail} "
        f"papangelou={time.perf_counter() - t_score:.1f}s]"
    )
    return results
