"""Pallas TPU kernels for the hot elementwise/stencil paths.

``detection_map_fused`` fuses the whole posnet-output -> detection-map chain
(reference ``pos_net_model.py:338-349`` + ``utils/math_utils.py:10-42``):
per-pixel vector normalisation, central-difference divergence, ``clip(-div/2,
0, 1) * sigmoid(mask)`` — one VMEM-resident kernel instead of ~10 HBM-bound
XLA ops. Used per CNN inference tile; numerically identical to the jnp
composition (validated in tests, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU tests interpret)
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

EPS = 1e-8


def _gradient_axis(f, axis):
    """np.gradient semantics: central differences inside, one-sided edges."""
    n = f.shape[axis]

    def sl(a, b):
        idx = [slice(None)] * f.ndim
        idx[axis] = slice(a, b)
        return tuple(idx)

    interior = (f[sl(2, n)] - f[sl(0, n - 2)]) * 0.5
    first = f[sl(1, 2)] - f[sl(0, 1)]
    last = f[sl(n - 1, n)] - f[sl(n - 2, n - 1)]
    return jnp.concatenate([first, interior, last], axis=axis)


def _detection_kernel(vec_x_ref, vec_y_ref, mask_ref, out_ref, *,
                      inv_spacing, mask_is_logit):
    vx = vec_x_ref[:]
    vy = vec_y_ref[:]
    norm = jnp.sqrt(vx * vx + vy * vy)
    safe = jnp.where(norm > 0, norm, 1.0)
    vx = jnp.where(norm > 0, vx / safe, 0.0)
    vy = jnp.where(norm > 0, vy / safe, 0.0)
    div = (_gradient_axis(vx, 0) + _gradient_axis(vy, 1)) * inv_spacing
    mask = mask_ref[:]
    if mask_is_logit:
        mask = 1.0 / (1.0 + jnp.exp(-mask))
    out_ref[:] = jnp.clip(-div * 0.5, 0.0, 1.0) * mask


@functools.partial(jax.jit, static_argnames=("interpret", "mask_is_logit"))
def detection_map_fused(vec: jnp.ndarray, mask_logit: jnp.ndarray,
                        interpret: bool = False,
                        mask_is_logit: bool = True) -> jnp.ndarray:
    """(H, W, 2) pointing vectors + (H, W) mask logits -> (H, W) detection map.

    Whole-array VMEM blocks (a 1024x1024 f32 tile is ~4 MB/input); fall back
    to tiling in future rounds if scenes outgrow VMEM.
    """
    h, w = mask_logit.shape
    # whole-array blocks must fit VMEM (~16 MB): 3 f32 inputs + output +
    # temporaries. Beyond that, use the XLA composition — exceeding VMEM
    # faults the TPU worker process.
    if h * w > 512 * 512 and not interpret:
        from mpp_cnn_rs_object_detection_tpu.ops.divergence import (
            divergence_map_from_vector_field,
        )

        div = divergence_map_from_vector_field(vec, normalize=True)
        m = jax.nn.sigmoid(mask_logit) if mask_is_logit else mask_logit
        return jnp.clip(-div / 2.0, 0.0, 1.0) * m
    # reference spacing quirk: size/(size-1) on both axes (math_utils.py:29-42)
    inv_spacing = (h - 1.0) / h
    kwargs = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    return pl.pallas_call(
        functools.partial(
            _detection_kernel, inv_spacing=inv_spacing,
            mask_is_logit=mask_is_logit,
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(**kwargs),
            pl.BlockSpec(**kwargs),
            pl.BlockSpec(**kwargs),
        ],
        out_specs=pl.BlockSpec(**kwargs),
        interpret=interpret,
    )(
        vec[..., 0].astype(jnp.float32),
        vec[..., 1].astype(jnp.float32),
        mask_logit.astype(jnp.float32),
    )


def detection_map_reference(vec: jnp.ndarray, mask_logit: jnp.ndarray
                            ) -> jnp.ndarray:
    """The plain jnp composition (for parity tests and CPU fallback)."""
    from mpp_cnn_rs_object_detection_tpu.ops.divergence import (
        divergence_map_from_vector_field,
    )

    div = divergence_map_from_vector_field(vec, normalize=True)
    return jnp.clip(-div / 2.0, 0.0, 1.0) * jax.nn.sigmoid(mask_logit)
