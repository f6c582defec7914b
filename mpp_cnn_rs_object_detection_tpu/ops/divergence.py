"""Divergence of 2D vector fields with np.gradient edge semantics, in jnp.

Rebuild of reference ``utils/math_utils.py:10-42`` (numpy) and
``models/position_net/torch_div.py:8-44`` (torch), used to turn the PosNet
pointing-vector field into a detection map. Implemented as pure jnp so it can
fuse into the jitted inference path (and into the div-classifier head).
"""

from __future__ import annotations

import jax.numpy as jnp


def gradient_1d(f: jnp.ndarray, axis: int, spacing: float = 1.0) -> jnp.ndarray:
    """np.gradient along one axis: central differences interior, one-sided edges."""
    f = jnp.moveaxis(f, axis, 0)
    interior = (f[2:] - f[:-2]) / (2.0 * spacing)
    first = (f[1:2] - f[0:1]) / spacing
    last = (f[-1:] - f[-2:-1]) / spacing
    g = jnp.concatenate([first, interior, last], axis=0)
    return jnp.moveaxis(g, 0, axis)


def divergence_ij(components, spacing=None) -> jnp.ndarray:
    """Divergence with 'ij' indexing: sum_i d(components[i])/d(axis i).

    ``components`` is a sequence of (H, W) fields (reference
    ``math_utils.py:10-26`` with indexing='ij').
    """
    num_dims = len(components)
    if spacing is None:
        spacing = [1.0] * num_dims
    out = gradient_1d(components[0], axis=0, spacing=spacing[0])
    for i in range(1, num_dims):
        out = out + gradient_1d(components[i], axis=i, spacing=spacing[i])
    return out


def divergence_map_from_vector_field(vector_field: jnp.ndarray, normalize: bool = True
                                     ) -> jnp.ndarray:
    """Divergence of an (H, W, 2) field, optionally of its unit-normalised version.

    Preserves a reference quirk (``math_utils.py:29-42``): the grid spacing is
    ``size/(size-1)`` with ``size = vector_field.shape[0]`` used for *both*
    axes (computed there via ``np.linspace(0, size, size)``).
    """
    size = vector_field.shape[0]
    sp = size / (size - 1.0)
    if normalize:
        norm = jnp.linalg.norm(vector_field, axis=-1, keepdims=True)
        vec = jnp.where(norm > 0, vector_field / jnp.where(norm > 0, norm, 1.0), 0.0)
    else:
        vec = vector_field
    return divergence_ij([vec[..., 0], vec[..., 1]], spacing=[sp, sp])
