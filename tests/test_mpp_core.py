"""MPP core tests: energy-vector algebra (the behavioral assertions of
reference ``test/test_energy_graph.py:38-244`` re-expressed for the vectorized
implementation), combinators, and a short RJMCMC run on synthetic maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
    LEGACY_SPEC,
    EnergySpec,
    energy_vectors,
    make_energy_maps,
    total_energy,
)
from mpp_cnn_rs_object_detection_tpu.mpp.kernels import make_kernel_data
from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
    RJMCMCParams,
    papangelou,
    run_chain,
    run_chains_batch,
)
from mpp_cnn_rs_object_detection_tpu.mpp.state import (
    empty_state,
    state_from_arrays,
    state_to_arrays,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

H = W = 64
C = 8


def blob_map(centers, sigma=2.0):
    gy, gx = np.mgrid[:H, :W]
    m = np.zeros((H, W))
    for c in centers:
        m += np.exp(-((gy - c[0]) ** 2 + (gx - c[1]) ** 2) / (2 * sigma**2))
    return np.clip(m, 0, 1)


@pytest.fixture(scope="module")
def setup():
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)
    centers = [(16, 16), (40, 40), (16, 48)]
    det = blob_map(centers)
    # mark energy maps: mildly prefer class 3 everywhere
    dist = np.full((H, W, C), 1.0 / C, np.float32)
    dist[..., 3] = 3.0 / C
    dist /= dist.sum(-1, keepdims=True)
    mark_energy = [-d for d in [dist, dist, dist]]  # no-calib style -p
    maps = make_energy_maps(
        detection_map=det,
        mark_energy_maps=mark_energy,
        threshold=0.5,
        min_area=4.0,
        max_area=200.0,
        mappings=mappings,
    )
    kd = make_kernel_data(det, [dist] * 3, mappings, intensity=100.0)
    return maps, kd, mappings, det, centers


def test_unary_energy_values(setup):
    maps, _, mappings, det, _ = setup
    # one rect at (16, 16), size 6, ratio 0.5, angle 0
    st = state_from_arrays([[16, 16]], [[6.0, 0.5, 0.0]], capacity=4)
    vec = np.asarray(energy_vectors(st, maps, LEGACY_SPEC))
    # position energy = -2 * (det - 0.5)
    np.testing.assert_allclose(vec[0, 0], -2 * (det[16, 16] - 0.5), rtol=1e-5)
    # dead slots are zero
    assert np.all(vec[1:] == 0)
    # area = length*width = (2*6/1.5) * (0.5*8) = 8*4 = 32, inside [4, 200] -> 0
    assert vec[0, LEGACY_SPEC.index("AreaPriorEnergy")] == 0.0
    # no neighbors -> overlap and alignment are 0
    assert vec[0, LEGACY_SPEC.index("RectangleOverlapEnergy")] == 0.0
    assert vec[0, LEGACY_SPEC.index("ShapeAlignmentEnergy")] == 0.0


def test_area_prior_hinge(setup):
    maps, _, _, _, _ = setup
    st = state_from_arrays([[16, 16]], [[1.0, 1.0, 0.0]], capacity=2)  # area 1
    vec = np.asarray(energy_vectors(st, maps, LEGACY_SPEC))
    np.testing.assert_allclose(
        vec[0, LEGACY_SPEC.index("AreaPriorEnergy")], 4.0 - 1.0, rtol=1e-5
    )


def test_overlap_and_alignment_pairs(setup):
    maps, _, _, _, _ = setup
    # identical rectangles at same spot -> overlap ratio 1 for both
    st = state_from_arrays(
        [[20, 20], [20, 20]], [[6.0, 0.5, 0.3], [6.0, 0.5, 0.3]], capacity=4
    )
    vec = np.asarray(energy_vectors(st, maps, LEGACY_SPEC))
    i_ov = LEGACY_SPEC.index("RectangleOverlapEnergy")
    i_al = LEGACY_SPEC.index("ShapeAlignmentEnergy")
    np.testing.assert_allclose(vec[:2, i_ov], 1.0, atol=1e-4)
    # same angle, rewarding -> 1 - |cos 0| - 1 = -1
    np.testing.assert_allclose(vec[:2, i_al], -1.0, atol=1e-5)

    # far apart -> no interaction
    st2 = state_from_arrays(
        [[10, 10], [50, 50]], [[6.0, 0.5, 0.3], [6.0, 0.5, 0.3]], capacity=4
    )
    vec2 = np.asarray(energy_vectors(st2, maps, LEGACY_SPEC))
    assert np.all(vec2[:2, i_ov] == 0.0)
    assert np.all(vec2[:2, i_al] == 0.0)

    # orthogonal angles within align radius -> 1 - 0 - 1 = 0 but max overlap >0
    st3 = state_from_arrays(
        [[20, 20], [20, 26]], [[6.0, 0.5, 0.0], [6.0, 0.5, np.pi / 2]], capacity=4
    )
    vec3 = np.asarray(energy_vectors(st3, maps, LEGACY_SPEC))
    np.testing.assert_allclose(vec3[:2, i_al], 0.0, atol=1e-5)


def test_birth_delta_is_isolated_point_energy(setup):
    """U(x + u) - U(x) for an isolated u == combined energy of u alone
    (the delta algebra of reference ``test_energy_graph.py:177-244``)."""
    maps, _, _, _, _ = setup
    comb = comb_lib.sum_combiner(LEGACY_SPEC.names)
    st = state_from_arrays([[10, 10]], [[6.0, 0.5, 0.0]], capacity=4)
    u0 = float(total_energy(st, maps, LEGACY_SPEC, comb))
    # add isolated point at (50, 50)
    st2 = state_from_arrays(
        [[10, 10], [50, 50]], [[6.0, 0.5, 0.0], [6.0, 0.5, 0.0]], capacity=4
    )
    u1 = float(total_energy(st2, maps, LEGACY_SPEC, comb))
    alone = state_from_arrays([[50, 50]], [[6.0, 0.5, 0.0]], capacity=4)
    u_alone = float(total_energy(alone, maps, LEGACY_SPEC, comb))
    np.testing.assert_allclose(u1 - u0, u_alone, rtol=1e-4)


def test_interacting_birth_delta(setup):
    """Adding an overlapping twin changes BOTH points' pair terms."""
    maps, _, _, _, _ = setup
    comb = comb_lib.sum_combiner(LEGACY_SPEC.names)
    st = state_from_arrays([[20, 20]], [[6.0, 0.5, 0.0]], capacity=4)
    u0 = float(total_energy(st, maps, LEGACY_SPEC, comb))
    st2 = state_from_arrays(
        [[20, 20], [20, 20]], [[6.0, 0.5, 0.0], [6.0, 0.5, 0.0]], capacity=4
    )
    u1 = float(total_energy(st2, maps, LEGACY_SPEC, comb))
    # delta = unary(new) + overlap(new)=1 + align(new)=-1 + changes on old
    # (old gains overlap 1 and align -1)
    vec1 = np.asarray(energy_vectors(st, maps, LEGACY_SPEC))
    vec2 = np.asarray(energy_vectors(st2, maps, LEGACY_SPEC))
    np.testing.assert_allclose(u1 - u0, vec2.sum() - vec1.sum(), rtol=1e-5)
    # the old point's vector changed by +1 (overlap) -1 (align)
    np.testing.assert_allclose(
        vec2[0] - vec1[0],
        np.array([0, 0, 1.0, -1.0, 0.0]),
        atol=1e-4,
    )


def test_manual_hierarchical_combiner(setup):
    maps, _, _, _, _ = setup
    weights = {
        "PositionEnergy": 2.0,
        "ShapeEnergy": 1.0,
        "RectangleOverlapEnergy": 3.0,
        "ShapeAlignmentEnergy": 0.5,
        "AreaPriorEnergy": 1.0,
    }
    comb = comb_lib.manual_hierarchical(LEGACY_SPEC.names, weights)
    # on a detection blob: pos energy < 0 -> indicator active
    st = state_from_arrays([[16, 16]], [[6.0, 0.5, 0.0]], capacity=2)
    vec = np.asarray(energy_vectors(st, maps, LEGACY_SPEC))
    e = np.asarray(comb_lib.combine(comb, jnp.asarray(vec)))
    expected = 2.0 * vec[0, 0] + (vec[0, 0] <= 0.0) * (
        1.0 * vec[0, 1] + 3.0 * vec[0, 2] + 0.5 * vec[0, 3] + 1.0 * vec[0, 4]
    )
    np.testing.assert_allclose(e[0], expected, rtol=1e-5)


def test_combiner_roundtrip(tmp_path, setup):
    comb = comb_lib.logistic(LEGACY_SPEC.names)
    path = str(tmp_path / "comb.json")
    comb_lib.save_combiner(path, comb)
    comb2 = comb_lib.load_combiner(path)
    vec = jnp.array(np.random.default_rng(0).normal(size=(5, 5)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(comb_lib.combine(comb, vec)),
        np.asarray(comb_lib.combine(comb2, vec)),
        rtol=1e-6,
    )


def test_logistic_formula_and_v1_migration():
    """The logistic combiner applies its scalar bias ONCE (reference
    ``combination/logistic.py:14-69``); v1 combiner files (rounds <= 3
    summed the bias per column) are migrated on load so trained artifacts
    keep their exact behavior."""
    names = LEGACY_SPEC.names
    comb = comb_lib.logistic(names)
    comb = comb.replace(
        params={
            "weights": jnp.arange(1.0, len(names) + 1.0),
            "bias": jnp.asarray(0.7, jnp.float32),
        }
    )
    vec = jnp.array(np.random.default_rng(1).normal(size=(4, len(names))),
                    jnp.float32)
    got = np.asarray(comb_lib.combine(comb, vec))
    w = np.arange(1.0, len(names) + 1.0)
    expected = 2.0 / (1.0 + np.exp(-(np.asarray(vec) @ w + 0.7))) - 1.0
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # a v1 dict (no "version") reproduces the old n-x-bias behavior
    v1 = {
        "kind": "logistic", "names": list(names), "indicator": 0,
        "params": {"weights": w.tolist(), "bias": 0.7},
    }
    migrated = comb_lib.combiner_from_dict(v1)
    old_formula = 2.0 / (
        1.0 + np.exp(-(np.asarray(vec) @ w + 0.7 * len(names)))
    ) - 1.0
    np.testing.assert_allclose(
        np.asarray(comb_lib.combine(migrated, vec)), old_formula, rtol=1e-5
    )
    # a v2 round-trip is the identity
    v2 = comb_lib.combiner_to_dict(comb)
    assert v2["version"] >= 2
    np.testing.assert_allclose(
        np.asarray(comb_lib.combine(comb_lib.combiner_from_dict(v2), vec)),
        got, rtol=1e-6,
    )


def test_papangelou(setup):
    maps, _, _, _, _ = setup
    comb = comb_lib.sum_combiner(LEGACY_SPEC.names)
    st = state_from_arrays(
        [[16, 16], [40, 40]], [[6.0, 0.5, 0.0], [6.0, 0.5, 0.0]], capacity=4
    )
    scores = np.asarray(papangelou(st, maps, LEGACY_SPEC, comb))
    u_full = float(total_energy(st, maps, LEGACY_SPEC, comb))
    st_wo = st.replace(alive=st.alive.at[0].set(False))
    u_wo = float(total_energy(st_wo, maps, LEGACY_SPEC, comb))
    np.testing.assert_allclose(scores[0], np.exp(u_wo - u_full), rtol=1e-4)
    assert scores[2] == 0.0 and scores[3] == 0.0  # dead slots


def _hrc_combiner():
    """Indicator-gated manual weights (priors only count on detections),
    as the reference's mpp_hrcM config does — a plain sum would let the
    rewarding alignment prior sustain off-detection clusters."""
    return comb_lib.manual_hierarchical(
        LEGACY_SPEC.names,
        {
            "PositionEnergy": 1.0,
            "ShapeEnergy": 0.25,
            "RectangleOverlapEnergy": 0.75,
            "ShapeAlignmentEnergy": 0.1,
            "AreaPriorEnergy": 0.25,
        },
    )


def test_rjmcmc_finds_objects(setup):
    maps, kd, mappings, det, centers = setup
    comb = _hrc_combiner()
    init = empty_state(capacity=32)
    key = jax.random.PRNGKey(0)
    final, stats = run_chain(
        key, init, maps, LEGACY_SPEC, comb, kd,
        n_steps=3000, t0=1.0, alpha_t=0.998, t_target=0.0,
    )
    n = int(final.n_points)
    assert n >= 2, f"sampler found only {n} points"
    assert float(stats.final_energy) < 0.0
    # accepted counts are sane
    assert np.all(np.asarray(stats.accepted) <= np.asarray(stats.proposed))
    # every surviving point sits on a detection blob
    xy, marks = state_to_arrays(final)
    for p in xy:
        assert det[int(p[0]), int(p[1])] > 0.3, f"point at {p} off-blob"


def test_cache_energy_matches_full_recompute(setup):
    """The incremental EnergyCache path must agree with the dense recompute
    through an arbitrary proposal sequence (cache correctness invariant,
    analog of reference ``EnergyGraph.check_integrity``)."""
    from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
        apply_proposal,
        sample_proposal,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.rjmcmc import (
        build_cache,
        energy_from_cache,
        update_cache,
    )

    from mpp_cnn_rs_object_detection_tpu.mpp.kernels import make_kernel_data

    maps, _, mappings, det, centers = setup
    # 10-kernel mixture: exercises split/merge cache updates too
    dist = np.asarray(_normalize_dists())
    kd = make_kernel_data(det, [dist] * 3, mappings, intensity=10.0,
                          use_split_merge=True)
    comb = _hrc_combiner()
    st = state_from_arrays(
        [[16, 16], [40, 40], [17, 18]],
        [[6.0, 0.5, 0.1], [5.0, 0.6, 1.0], [6.0, 0.5, 0.2]],
        capacity=8,
    )
    cache = build_cache(st, maps, LEGACY_SPEC)
    key = jax.random.PRNGKey(3)
    for i in range(40):
        key, k1, k2 = jax.random.split(key, 3)
        kidx = jax.random.randint(k1, (), 0, 10)
        prop = sample_proposal(k2, kidx, st, kd)
        st = apply_proposal(st, prop)
        slot = jnp.clip(prop.slot, 0, st.capacity - 1)
        slot2 = jnp.clip(prop.slot2, 0, st.capacity - 1)
        cache = update_cache(st, maps, LEGACY_SPEC, cache, slot)
        cache = update_cache(st, maps, LEGACY_SPEC, cache, slot2)
        e_cache = float(energy_from_cache(st, maps, LEGACY_SPEC, comb, cache))
        e_full = float(total_energy(st, maps, LEGACY_SPEC, comb))
        np.testing.assert_allclose(e_cache, e_full, rtol=1e-4, atol=1e-5)


def _normalize_dists():
    dist = np.full((H, W, C), 1.0 / C, np.float32)
    dist[..., 3] = 3.0 / C
    return dist / dist.sum(-1, keepdims=True)


def test_rjmcmc_batch(setup):
    maps, kd, mappings, det, centers = setup
    comb = _hrc_combiner()
    batch = 4
    init = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * batch), empty_state(capacity=16)
    )
    finals, stats = run_chains_batch(
        jax.random.PRNGKey(1), init, maps, LEGACY_SPEC, comb, kd,
        n_steps=1500, alpha_t=0.997,
    )
    assert finals.xy.shape == (batch, 16, 2)
    # chains are independent: different outcomes
    assert len({int(n) for n in np.asarray(stats.final_n_points)}) >= 1
    assert np.all(np.asarray(stats.final_energy) <= 0.0)


def test_params_auto_alpha_and_multiplier():
    # 'auto' reaches t_target in burn_in steps, then anneals toward 0
    # (reference sample_rjmcmc.py:62-64)
    p = RJMCMCParams(n_steps=1000, t0=1.0, t_target=0.05, alpha_t="auto")
    a = p.resolved_alpha()
    np.testing.assert_allclose(a**1000, 0.05, rtol=1e-6)
    assert p.resolved_t_target() == 0.0
    # iter_multiplier scales steps and takes the matching root of alpha
    # (reference sample_rjmcmc.py:58-61)
    m = RJMCMCParams(n_steps=1000, alpha_t=0.999, samples_interval=8,
                     n_samples=2, iter_multiplier=2.0)
    assert m.burn_in == 2000 and m.resolved_interval == 16
    assert m.total_steps == 2000 + 3 * 16
    np.testing.assert_allclose(m.resolved_alpha() ** 2, 0.999, rtol=1e-12)
    # plain float passes through
    assert RJMCMCParams(alpha_t=0.99).resolved_alpha() == 0.99


def test_run_chain_collects_samples(setup):
    maps, kd, mappings, det, centers = setup
    comb = _hrc_combiner()
    init = empty_state(capacity=16)
    key = jax.random.PRNGKey(3)
    n_steps, interval, burn_in, n_samples = 200, 1, 150, 3
    final, stats, samples, n_coll = run_chain(
        key, init, maps, LEGACY_SPEC, comb, kd,
        n_steps=n_steps, t0=1.0, alpha_t=0.99, t_target=0.0,
        n_samples=n_samples, samples_interval=interval, burn_in=burn_in,
    )
    # sampling rule: g >= burn_in and g % interval == 0 (reference
    # sample_rjmcmc.py:90-102)
    assert int(n_coll) == n_steps - burn_in
    assert samples.xy.shape == (n_samples, 16, 2)
    # interval=1 and burn_in < n_steps: the last sample IS the final state
    np.testing.assert_array_equal(np.asarray(samples.xy[-1]),
                                  np.asarray(final.xy))
    np.testing.assert_array_equal(np.asarray(samples.alive[-1]),
                                  np.asarray(final.alive))
    # earlier samples are valid states too (alive mask boolean, finite xy)
    assert np.all(np.isfinite(np.asarray(samples.xy)))


def test_run_chain_sampling_respects_burn_in(setup):
    maps, kd, mappings, det, centers = setup
    comb = _hrc_combiner()
    init = empty_state(capacity=16)
    # no step reaches burn_in -> nothing collected
    _, _, samples, n_coll = run_chain(
        jax.random.PRNGKey(4), init, maps, LEGACY_SPEC, comb, kd,
        n_steps=50, alpha_t=0.99, n_samples=2, samples_interval=8,
        burn_in=1000,
    )
    assert int(n_coll) == 0
    # step_offset shifts the global schedule (segmented launches)
    _, _, _, n_coll2 = run_chain(
        jax.random.PRNGKey(4), init, maps, LEGACY_SPEC, comb, kd,
        n_steps=50, alpha_t=0.99, n_samples=2, samples_interval=8,
        burn_in=1000, step_offset=1000,
    )
    assert int(n_coll2) == 7  # g in {1000,1008,...,1048}


def test_kernel_data_device_prep_matches_host_reference():
    """The device-side map prep (stack/normalise/cumsum/pad moved off-host
    for the flagship scene "prep" stage) reproduces the original host-numpy
    float64 construction, on both list and pre-stacked device inputs."""
    import jax.numpy as jnp

    from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
        stack_param_dists,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.kernels import (
        EPS,
        MAX_DELTA,
        make_kernel_data,
    )
    from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

    rng = np.random.default_rng(11)
    det = rng.random((24, 20)).astype(np.float32)
    det[det < 0.3] = 0.0
    dists = [rng.random((24, 20, C)).astype(np.float32) for _ in range(3)]
    mappings = default_mappings(n_classes=C, size_min=0, size_max=16)

    kd = make_kernel_data(det, dists, mappings, intensity=7.0)
    # pre-stacked device input must give the identical result
    kd2 = make_kernel_data(det, stack_param_dists(dists), mappings,
                           intensity=7.0)
    np.testing.assert_array_equal(np.asarray(kd.mark_dists),
                                  np.asarray(kd2.mark_dists))
    np.testing.assert_array_equal(np.asarray(kd.birth_cdf),
                                  np.asarray(kd2.birth_cdf))

    # host-numpy float64 reference (the pre-round-3 construction)
    d64 = np.maximum(np.asarray(det, np.float64), 0.0)
    norm = d64 / max(d64.sum(), 1e-30)
    np.testing.assert_allclose(np.asarray(kd.birth_cdf),
                               np.cumsum(norm.ravel()), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(kd.log_birth_density),
                               np.log(norm + EPS), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kd.padded_density),
                               np.pad(norm, MAX_DELTA), rtol=1e-5, atol=1e-7)
    ref_dists = np.stack(dists).astype(np.float64)
    ref_dists /= np.maximum(ref_dists.sum(-1, keepdims=True), 1e-30)
    np.testing.assert_allclose(np.asarray(kd.mark_dists), ref_dists,
                               rtol=1e-5, atol=1e-6)

    # stack_param_dists pads H/W on device like the scene bucket pad
    padded = stack_param_dists(dists, (3, 5))
    assert padded.shape == (3, 27, 25, C)
    np.testing.assert_array_equal(np.asarray(padded[:, 24:, :, :]), 0.0)
    np.testing.assert_array_equal(np.asarray(padded[:, :24, :20, :]),
                                  np.stack(dists))
