"""Pallas kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.ops.pallas_kernels import (
    detection_map_fused,
    detection_map_reference,
)


def test_detection_map_fused_parity():
    rng = np.random.default_rng(0)
    vec = jnp.asarray(rng.normal(size=(64, 96, 2)).astype(np.float32))
    mask = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    out_p = detection_map_fused(vec, mask, interpret=True)
    out_r = detection_map_reference(vec, mask)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), rtol=1e-5, atol=1e-6
    )
    # pre-sigmoided mask mode
    sig = jax.nn.sigmoid(mask)
    out_s = detection_map_fused(vec, sig, interpret=True, mask_is_logit=False)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_r), rtol=1e-5, atol=1e-6
    )
