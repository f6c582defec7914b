"""Cell-parallel sampler: finds objects, stays on-detection, and its
equilibrium matches the sequential sampler's on the same posterior."""

import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    LEGACY_SPEC,
    make_energy_maps,
)
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import make_kernel_data
from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
    run_parallel_chain,
)
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import run_chain
from mpp_cnn_rs_object_detection_tpu.mpp.state import (
    empty_state,
    state_to_arrays,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

H = W = 160
C = 8


def _setup():
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    centers = [(30, 30), (30, 120), (100, 60), (130, 130), (70, 100)]
    gy, gx = np.mgrid[:H, :W]
    det = np.zeros((H, W))
    for c in centers:
        det += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / (2 * 2.0**2))
    det = np.clip(det, 0, 1)
    dist = np.full((H, W, C), 1.0 / C, np.float32)
    dist[..., 3] = 3.0 / C
    dist /= dist.sum(-1, keepdims=True)
    maps = make_energy_maps(det, [-dist] * 3, 0.5, 4.0, 200.0, mappings)
    kd = make_kernel_data(det, [dist] * 3, mappings, intensity=5.0)
    comb = comb_lib.manual_hierarchical(
        LEGACY_SPEC.names,
        {
            "PositionEnergy": 1.0,
            "ShapeEnergy": 0.25,
            "RectangleOverlapEnergy": 0.75,
            "ShapeAlignmentEnergy": 0.1,
            "AreaPriorEnergy": 0.25,
        },
    )
    return maps, kd, comb, det, centers


def test_parallel_chain_finds_objects():
    maps, kd, comb, det, centers = _setup()
    final, stats = run_parallel_chain(
        jax.random.PRNGKey(0), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=800, alpha_t=0.994,
    )
    n = int(final.n_points)
    assert n >= 3, f"parallel sampler found only {n} points"
    assert float(stats.final_energy) < -1.0
    xy, _ = state_to_arrays(final)
    on_blob = sum(det[int(p[0]), int(p[1])] > 0.3 for p in xy)
    assert on_blob >= n - 1, f"{on_blob}/{n} points on detections"


def test_parallel_energy_bookkeeping_consistent():
    """The incrementally-tracked energy must equal a fresh recompute."""
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import total_energy

    maps, kd, comb, det, centers = _setup()
    final, stats = run_parallel_chain(
        jax.random.PRNGKey(1), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=300, alpha_t=0.99,
    )
    u_fresh = float(total_energy(final, maps, LEGACY_SPEC, comb))
    np.testing.assert_allclose(
        float(stats.final_energy), u_fresh, rtol=1e-3, atol=1e-3
    )


def test_parallel_matches_sequential_equilibrium():
    """Both samplers annealed on the same posterior should land at similar
    energies / point counts (statistical parity, SURVEY.md §7.3)."""
    maps, kd, comb, det, centers = _setup()
    seq_final, seq_stats = run_chain(
        jax.random.PRNGKey(2), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_steps=6000, alpha_t=0.9992,
    )
    par_final, par_stats = run_parallel_chain(
        jax.random.PRNGKey(3), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=1500, alpha_t=0.9968,
    )
    e_seq = float(seq_stats.final_energy)
    e_par = float(par_stats.final_energy)
    assert e_par < 0 and e_seq < 0
    # same order of magnitude of fit quality; count parity is asserted on
    # DISTINCT detections (>3 px apart): this deliberately permissive manual
    # energy makes stacking near-coincident points on a blob favorable, and
    # the data-driven moves are good enough at minimising it to find that
    # degenerate optimum — raw counts then measure kernel efficiency, not
    # the posterior
    assert e_par <= 0.5 * e_seq, (e_par, e_seq)

    def n_distinct(final):
        xy, _ = state_to_arrays(final)
        kept = []
        for p in xy:
            if all(np.hypot(*(p - q)) > 3 for q in kept):
                kept.append(p)
        return len(kept)

    nd_seq, nd_par = n_distinct(seq_final), n_distinct(par_final)
    assert abs(nd_seq - nd_par) <= 2, (nd_seq, nd_par)
    assert nd_par >= 4


def test_data_moves_equilibrium_and_confinement():
    """The data-driven translation/mark-transform mixture (reference
    ``transform_kernels.py:61-225`` at 2:1 weighting) must reach an
    equilibrium at least as good as the gaussian-only superstep on the same
    posterior, keep the bookkept energy exact, and keep every point inside
    the image (moves are cell-confined)."""
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import total_energy

    maps, kd, comb, det, centers = _setup()
    final_d, stats_d = run_parallel_chain(
        jax.random.PRNGKey(7), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=1500, alpha_t=0.9968, data_moves=True,
    )
    final_g, stats_g = run_parallel_chain(
        jax.random.PRNGKey(7), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=1500, alpha_t=0.9968, data_moves=False,
    )
    e_d, e_g = float(stats_d.final_energy), float(stats_g.final_energy)
    assert e_d < 0 and e_g < 0
    # same posterior, same budget: the data mixture should not be worse
    # than gaussian-only by more than annealing noise
    assert e_d <= 0.5 * e_g, (e_d, e_g)
    # bookkept energy stays exact under the new kernels
    u_fresh = float(total_energy(final_d, maps, LEGACY_SPEC, comb))
    np.testing.assert_allclose(e_d, u_fresh, rtol=1e-3, atol=1e-3)
    # confinement: every alive point inside the image
    xy, _ = state_to_arrays(final_d)
    assert len(xy) >= 3
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] <= H - 1).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] <= W - 1).all()
    # and on-detection (the data moves pull points onto blobs)
    on_blob = sum(det[int(p[0]), int(p[1])] > 0.3 for p in xy)
    assert on_blob >= len(xy) - 1, f"{on_blob}/{len(xy)} on detections"


def test_move_switch_equilibrium():
    """The switched superstep (ONE global move type per superstep via
    lax.switch — the dispatch-bound path's op-count lever) is the same
    statistical mixture as per-cell type draws: equilibria must match."""
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import total_energy

    maps, kd, comb, det, centers = _setup()
    final_s, stats_s = run_parallel_chain(
        jax.random.PRNGKey(11), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=1500, alpha_t=0.9968, move_switch=True,
    )
    final_p, stats_p = run_parallel_chain(
        jax.random.PRNGKey(11), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=1500, alpha_t=0.9968, move_switch=False,
    )
    e_s, e_p = float(stats_s.final_energy), float(stats_p.final_energy)
    assert e_s < 0 and e_p < 0
    assert e_s <= 0.5 * e_p, (e_s, e_p)
    # bookkept energy exact under the switched kernels
    u_fresh = float(total_energy(final_s, maps, LEGACY_SPEC, comb))
    np.testing.assert_allclose(e_s, u_fresh, rtol=1e-3, atol=1e-3)
    # finds the blobs
    xy, _ = state_to_arrays(final_s)
    on_blob = sum(det[int(p[0]), int(p[1])] > 0.3 for p in xy)
    assert len(xy) >= 3 and on_blob >= len(xy) - 1


def test_superstep_deltas_exact_vs_bruteforce():
    """The top-2 incremental ΔU must equal the brute-force delta
    (apply + cache row refresh + full energy recompute) for every kind."""
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
        _apply_one,
        superstep_deltas,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
        build_cache,
        energy_from_cache,
        update_cache,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays

    maps, kd, comb, det, centers = _setup()
    rng = np.random.default_rng(5)
    # a crowded state incl. interacting pairs and dead slots
    xy = np.array(
        [[30, 30], [33, 34], [30, 120], [100, 60], [101, 63], [130, 130],
         [70, 100], [20, 20]], np.float32,
    )
    marks = np.tile(np.array([[6.0, 0.6, 0.4]], np.float32), (8, 1))
    marks[1, 2] = 1.2
    marks[4, 2] = 2.0
    st = state_from_arrays(xy, marks, capacity=12)  # slots 8..11 dead
    cache = build_cache(st, maps, LEGACY_SPEC)
    u0 = energy_from_cache(st, maps, LEGACY_SPEC, comb, cache)

    # proposals: birth into free slot, death, move (translate), transform
    kinds = jnp.asarray([1, 2, 3, 3, 0], jnp.int32)
    slots = jnp.asarray([9, 1, 4, 6, 2], jnp.int32)
    xys = jnp.asarray(
        [[31.0, 125.0], [33, 34], [99, 60], [70, 100], [0, 0]], jnp.float32
    )
    ms = jnp.asarray(
        [[5.0, 0.5, 0.3], [6, 0.6, 0.4], [6, 0.6, 1.1], [7, 0.7, 0.4],
         [1, 0.1, 0.1]],
        jnp.float32,
    )
    fast = np.asarray(
        superstep_deltas(st, cache, maps, LEGACY_SPEC, comb, kinds, slots,
                         xys, ms)
    )
    for i in range(5):
        if int(kinds[i]) == 0:
            assert fast[i] == 0.0
            continue
        st_i = _apply_one(st, kinds[i], slots[i], xys[i], ms[i])
        ca_i = update_cache(st_i, maps, LEGACY_SPEC, cache, slots[i])
        u_i = energy_from_cache(st_i, maps, LEGACY_SPEC, comb, ca_i)
        np.testing.assert_allclose(
            fast[i], float(u_i - u0), rtol=1e-4, atol=1e-4,
            err_msg=f"proposal {i} (kind {int(kinds[i])})",
        )


def test_batched_apply_cache_matches_rebuild():
    """After supersteps with many simultaneous accepts, the scattered cache
    must equal a from-scratch build on the final state (alive entries)."""
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
        make_local_view,
        make_parallel_step,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import build_cache

    maps, kd, comb, det, centers = _setup()
    view = make_local_view(kd, maps)
    h, w = kd.log_birth_density.shape
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import CELL
    n_cells = max(h, w) // (2 * CELL) + 1
    step = jax.jit(
        make_parallel_step(maps, LEGACY_SPEC, comb, kd, 0.994, 0.0, n_cells)
    )
    state = empty_state(32)
    cache = build_cache(state, maps, LEGACY_SPEC)
    carry = (state, cache, jnp.asarray(0.0), jnp.asarray(1.0))
    for i in range(500):
        carry, _ = step(carry, jax.random.PRNGKey(100 + i))
    state, cache = carry[0], carry[1]
    assert int(state.n_points) >= 2  # exercised multi-accept supersteps
    fresh = build_cache(state, maps, LEGACY_SPEC)
    pair_mask = np.asarray(state.alive)[:, None] & np.asarray(state.alive)[None, :]
    for name in ("dist", "overlap", "align"):
        got = np.asarray(getattr(cache, name))[pair_mask]
        want = np.asarray(getattr(fresh, name))[pair_mask]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=name)
    alive = np.asarray(state.alive)
    np.testing.assert_allclose(np.asarray(cache.pos_e)[alive],
                               np.asarray(fresh.pos_e)[alive],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cache.mark_e)[alive],
                               np.asarray(fresh.mark_e)[alive],
                               rtol=1e-4, atol=1e-4)


def test_superstep_deltas_two_slot_exact_vs_bruteforce():
    """The TOP-3 two-slot ΔU (split=4 / merge=5) must equal the brute-force
    delta (apply both slots + cache row refreshes + full energy recompute),
    and single-slot lanes in the same batch must keep their exact deltas."""
    from mpp_cnn_rs_object_detection_tpu.mpp.parallel_sampler import (
        superstep_deltas,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
        build_cache,
        energy_from_cache,
        update_cache,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.state import state_from_arrays

    maps, kd, comb, det, centers = _setup()
    xy = np.array(
        [[30, 30], [33, 34], [30, 120], [100, 60], [101, 63], [130, 130],
         [70, 100], [20, 20]], np.float32,
    )
    marks = np.tile(np.array([[6.0, 0.6, 0.4]], np.float32), (8, 1))
    marks[1, 2] = 1.2
    marks[4, 2] = 2.0
    st = state_from_arrays(xy, marks, capacity=12)  # slots 8..11 dead
    cache = build_cache(st, maps, LEGACY_SPEC)
    u0 = energy_from_cache(st, maps, LEGACY_SPEC, comb, cache)

    # lanes: split of 0 (children overlap 1), merge of 3+4, birth, death,
    # move — the single-slot lanes must match the top-2 path bit-for-bit
    kinds = jnp.asarray([4, 5, 1, 2, 3], jnp.int32)
    slots = jnp.asarray([0, 3, 9, 1, 6], jnp.int32)
    slots2 = jnp.asarray([10, 4, -1, -1, -1], jnp.int32)
    xys = jnp.asarray(
        [[28.0, 28.0], [100.5, 61.5], [31.0, 125.0], [33, 34], [70, 100]],
        jnp.float32,
    )
    xys2 = jnp.asarray(
        [[32.0, 33.0], [0, 0], [0, 0], [0, 0], [0, 0]], jnp.float32
    )
    ms = jnp.asarray(
        [[5.5, 0.55, 0.3], [6.0, 0.6, 1.1], [5.0, 0.5, 0.3],
         [6, 0.6, 0.4], [7, 0.7, 0.4]], jnp.float32,
    )
    ms2 = jnp.asarray(
        [[6.5, 0.65, 0.5], [1, 0.1, 0.1], [1, 0.1, 0.1], [1, 0.1, 0.1],
         [1, 0.1, 0.1]], jnp.float32,
    )
    fast = np.asarray(
        superstep_deltas(st, cache, maps, LEGACY_SPEC, comb, kinds, slots,
                         xys, ms, slots2=slots2, xys2=xys2, markss2=ms2)
    )
    # single-slot lanes: cross-check against the top-2 path
    fast1 = np.asarray(
        superstep_deltas(st, cache, maps, LEGACY_SPEC, comb, kinds[2:],
                         slots[2:], xys[2:], ms[2:])
    )
    np.testing.assert_allclose(fast[2:], fast1, rtol=1e-5, atol=1e-5)

    def apply_two(kind, s, xy_s, m_s, s2, xy_s2, m_s2):
        new_xy = st.xy.at[s].set(xy_s)
        new_marks = st.marks.at[s].set(m_s)
        new_alive = st.alive
        if kind == 4:
            new_xy = new_xy.at[s2].set(xy_s2)
            new_marks = new_marks.at[s2].set(m_s2)
            new_alive = new_alive.at[s2].set(True)
        else:
            new_alive = new_alive.at[s2].set(False)
        st2 = st.replace(xy=new_xy, marks=new_marks, alive=new_alive)
        ca = update_cache(st2, maps, LEGACY_SPEC, cache, s)
        ca = update_cache(st2, maps, LEGACY_SPEC, ca, s2)
        return energy_from_cache(st2, maps, LEGACY_SPEC, comb, ca)

    for i in range(2):
        u_i = apply_two(int(kinds[i]), int(slots[i]), xys[i], ms[i],
                        int(slots2[i]), xys2[i], ms2[i])
        np.testing.assert_allclose(
            fast[i], float(u_i - u0), rtol=1e-4, atol=1e-4,
            err_msg=f"two-slot proposal {i} (kind {int(kinds[i])})",
        )


def test_split_merge_superstep_equilibrium_and_cache():
    """A chain with the split/merge pair enabled reaches a comparable
    equilibrium on the same posterior, keeps its energy bookkeeping exact,
    and its scattered cache matches a from-scratch rebuild."""
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
        build_cache,
        energy_from_cache,
    )

    maps, kd, comb, det, centers = _setup()
    final, stats = run_parallel_chain(
        jax.random.PRNGKey(3), empty_state(32), maps, LEGACY_SPEC, comb, kd,
        n_supersteps=800, alpha_t=0.994, split_merge=True,
    )
    n = int(final.n_points)
    assert 3 <= n <= 10, f"expected ~5 objects, got {n}"
    # bookkeeping: carried energy must equal a recompute on the final state
    fresh = build_cache(final, maps, LEGACY_SPEC)
    u_fresh = float(energy_from_cache(final, maps, LEGACY_SPEC, comb, fresh))
    np.testing.assert_allclose(
        float(stats.final_energy), u_fresh, rtol=1e-3, atol=1e-3
    )
    # detections sit on the planted blobs
    xy, marks = state_to_arrays(final)
    d = np.linalg.norm(
        xy[:, None, :] - np.asarray(centers, np.float32)[None], axis=-1
    )
    assert (d.min(axis=1) < 6.0).mean() > 0.6
