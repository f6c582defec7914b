"""Multi-device tests on the virtual 8-device CPU mesh: halo-exchange
sharded inference correctness, data-parallel train step, stopping-condition
segmented chains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_halo_exchange_rows():
    from mpp_cnn_rs_object_detection_tpu.parallel.halo import (
        halo_exchange_rows,
        shard_map,
    )
    from mpp_cnn_rs_object_detection_tpu.parallel.mesh import make_mesh
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(("data",))
    n = mesh.devices.size
    h_loc, halo = 4, 2
    x = jnp.arange(n * h_loc * 3, dtype=jnp.float32).reshape(n * h_loc, 3)

    out = shard_map(
        lambda b: halo_exchange_rows(b, halo, "data"),
        mesh=mesh,
        in_specs=(P("data", None),),
        out_specs=P("data", None),
        check_rep=False,
    )(x)
    out = np.asarray(out).reshape(n, h_loc + 2 * halo, 3)
    xs = np.asarray(x).reshape(n, h_loc, 3)
    for d in range(n):
        # middle is the local block
        np.testing.assert_array_equal(out[d, halo:-halo], xs[d])
        # top halo: last rows of the previous shard (zeros at the scene top)
        expect_top = np.zeros((halo, 3)) if d == 0 else xs[d - 1, -halo:]
        np.testing.assert_array_equal(out[d, :halo], expect_top)
        expect_bot = np.zeros((halo, 3)) if d == n - 1 else xs[d + 1, :halo]
        np.testing.assert_array_equal(out[d, -halo:], expect_bot)


def test_sharded_unet_inference_exact():
    """Sharded forward == single-device forward of the halo-zero-padded scene."""
    from mpp_cnn_rs_object_detection_tpu.models.unet import PosNet
    from mpp_cnn_rs_object_detection_tpu.parallel.halo import (
        sharded_unet_inference,
    )
    from mpp_cnn_rs_object_detection_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("data",))
    n = mesh.devices.size
    net = PosNet(hidden_dims=[8, 16], out_channels=3)
    key = jax.random.PRNGKey(0)
    variables = net.init(key, jnp.zeros((1, 32, 32, 3)), train=False)

    h_loc, halo, w = 16, 16, 32  # h_loc + 2*halo = 48, multiple of 8
    scene = jax.random.uniform(jax.random.PRNGKey(1), (n * h_loc, w, 3))

    def apply_hwc(x):
        return net.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            x[None], train=False,
        )[0]

    sharded = sharded_unet_inference(apply_hwc, scene, mesh, halo=halo)

    padded = jnp.pad(scene, ((halo, halo), (0, 0), (0, 0)))
    reference = apply_hwc(padded)[halo:-halo]
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(reference), rtol=2e-4, atol=2e-5
    )


def test_stopping_segmented_chain():
    from mpp_cnn_rs_object_detection_tpu.mpp import combinators as comb_lib
    from mpp_cnn_rs_object_detection_tpu.mpp.energies import (
        LEGACY_SPEC,
        make_energy_maps,
    )
    from mpp_cnn_rs_object_detection_tpu.mpp.kernels import make_kernel_data
    from mpp_cnn_rs_object_detection_tpu.mpp.state import empty_state
    from mpp_cnn_rs_object_detection_tpu.mpp.stopping import (
        CompositeStopping,
        StopOnDeltaU,
        StopOnMaxIter,
        run_chain_segmented,
    )
    from mpp_cnn_rs_object_detection_tpu.ops.mappings import default_mappings

    h = w = 48
    gy, gx = np.mgrid[:h, :w]
    det = np.clip(
        np.exp(-((gy - 24) ** 2 + (gx - 24) ** 2) / 8.0), 0, 1
    ).astype(np.float32)
    mappings = default_mappings(8, 0, 16)
    dist = np.full((h, w, 8), 1 / 8, np.float32)
    maps = make_energy_maps(det, [-dist] * 3, 0.5, 2.0, 200.0, mappings)
    kd = make_kernel_data(det, [dist] * 3, mappings, intensity=4.0)
    comb = comb_lib.manual_hierarchical(
        LEGACY_SPEC.names, {n_: 1.0 for n_ in LEGACY_SPEC.names}
    )
    stopping = CompositeStopping(
        [StopOnMaxIter(2000), StopOnDeltaU(tol=1e-5, n_window=2, min_iter=500)]
    )
    state, summaries = run_chain_segmented(
        jax.random.PRNGKey(0), empty_state(8), maps, LEGACY_SPEC, comb, kd,
        stopping, segment=250, alpha_t=0.995,
    )
    assert summaries, "no segments ran"
    assert summaries[-1].iter <= 2000
    # timer report renders
    from mpp_cnn_rs_object_detection_tpu.mpp.stopping import ChainTimer

    timer = ChainTimer()
    timer.extend(summaries)
    assert "moves/s" in timer.show_results()
