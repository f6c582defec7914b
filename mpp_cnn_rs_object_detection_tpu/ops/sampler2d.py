"""Sampling pixel coordinates from 2D density maps.

Rebuild of reference ``utils/sampler2d.py:5-48`` (``rng.choice`` over the
flattened map) with two backends:

  - a host/numpy path with the same draw-without-replacement semantics for the
    data pipeline (patch samplers, synth data);
  - a jnp inverse-CDF path (cumsum + searchsorted on uniforms) used to
    pre-sample thousands of data-driven birth/translation proposals for the
    RJMCMC scan in one vectorised shot, instead of one ``rng.choice`` per step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sample_point_2d(img_shape: Tuple[int, int], size: int = 1,
                    density: Optional[np.ndarray] = None,
                    skip_normalization: bool = False,
                    rng: Optional[np.random.Generator] = None,
                    mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Host-side sampler, drop-in equivalent of the reference function.

    Returns an (size, 2) array of (row, col) coordinates drawn from ``density``
    (uniform if None), without replacement when a density/mask is given.
    ``mask`` restricts a None density to mask-true pixels, and *excludes*
    mask-true pixels from an explicit density (reference semantics).
    """
    if rng is None:
        rng = np.random.default_rng()

    if density is None and mask is None:
        # fully uniform: independent row/col draws, with replacement
        return rng.integers(
            [0, 0], [img_shape[0], img_shape[1]], size=(size, 2)
        )

    # resolve a flat probability vector, then one weighted draw
    if density is None:
        p = np.asarray(mask, np.float64).ravel()
    else:
        p = np.asarray(density, np.float64).ravel()
        if skip_normalization and mask is None:
            p = p.copy()  # trusted pre-normalised input
        if mask is not None:
            p = np.where(np.asarray(mask).ravel(), 0.0, p)
    p = p / p.sum()
    flat = rng.choice(p.size, size=size, replace=False, p=p)
    return np.stack(np.unravel_index(flat, img_shape), axis=-1)


def density_cdf(density: jnp.ndarray) -> jnp.ndarray:
    """Flattened, normalised cumulative distribution of a 2D density map."""
    flat = jnp.clip(jnp.ravel(density), 0.0, None).astype(jnp.float32)
    total = jnp.sum(flat)
    flat = jnp.where(total > 0, flat / total, 1.0 / flat.shape[0])
    return jnp.cumsum(flat)


def sample_from_cdf(key: jax.Array, cdf: jnp.ndarray, shape_hw: Tuple[int, int],
                    n: int) -> jnp.ndarray:
    """Draw ``n`` (row, col) samples (with replacement) via inverse-CDF.

    One vectorised searchsorted replaces ``n`` sequential ``rng.choice`` calls;
    this is how data-driven birth positions are pre-sampled for a whole
    RJMCMC chain before the lax.scan runs.
    """
    u = jax.random.uniform(key, (n,), dtype=jnp.float32)
    idx = jnp.searchsorted(cdf, u, side="right")
    idx = jnp.clip(idx, 0, shape_hw[0] * shape_hw[1] - 1)
    return jnp.stack([idx // shape_hw[1], idx % shape_hw[1]], axis=-1).astype(jnp.int32)


def categorical_from_rows(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Sample one class per row from (..., C) probability rows via Gumbel-max."""
    logp = jnp.log(jnp.clip(probs, 1e-30, None))
    g = jax.random.gumbel(key, probs.shape, dtype=jnp.float32)
    return jnp.argmax(logp + g, axis=-1).astype(jnp.int32)
