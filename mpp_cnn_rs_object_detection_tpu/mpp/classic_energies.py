"""CNN-free data energies: contrast measures and gradient alignment.

Rebuild of reference ``models/mpp/energies/classics.py:13-238``. The reference
rasterises each candidate polygon with skimage.draw and set-based dilation per
evaluation (Python, per-object); here every candidate gathers a fixed local
window around its center and the interior / rim masks are ANALYTIC
point-in-rotated-rect tests on the window grid — branch-free, vmappable over
all K slots, and identical in intent (interior band vs dilated rim band).

Differences from the reference (deliberate, TPU-native):
  - the rim is a euclidean offset band of the rectangle (width ``dilation``,
    offset ``gap``) instead of an iterative 4-neighborhood dilation of a
    rasterised polygon — same ~2 px ring, closed form;
  - pixels are soft-counted with inclusion tests on the window grid; windows
    are static (WINDOW x WINDOW) so XLA fuses the whole contrast computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray
EPS = 1e-8
CONTRAST_WINDOW = 48  # covers max rect (size 32) + dilation


@dataclass(frozen=True)
class ContrastConfig:
    measure: str = "craciun2"  # lafarge | craciun | craciun2 | mean | t-test
    dilation: int = 2
    gap: int = 1
    erode: int = 1
    rgb: bool = True
    thresh: float = 0.0
    window: int = CONTRAST_WINDOW


def _window_grid(window: int):
    r = window // 2
    gy, gx = jnp.mgrid[-r : window - r, -r : window - r]
    return gy.astype(jnp.float32), gx.astype(jnp.float32)


def _rect_local_coords(gy, gx, cy, cx, angle):
    """Rotate window offsets into the rectangle frame (same construction as
    ``label_processing.rect_mask``)."""
    dy = gy + (jnp.round(cy) - cy)
    dx = gx + (jnp.round(cx) - cx)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    u = cos * dy + sin * dx
    v = -sin * dy + cos * dx
    return u, v


def _in_rect(u, v, a, b, pad=0.0):
    """|local| within half-extents (a = short/width, b = long/length)."""
    return (jnp.abs(u) <= a / 2 + pad) & (jnp.abs(v) <= b / 2 + pad)


def _masked_stats(values, mask):
    """(mean, var, count) of ``values`` where ``mask`` (bool)."""
    m = mask.astype(jnp.float32)
    cnt = jnp.sum(m) + EPS
    mean = jnp.sum(values * m) / cnt
    var = jnp.sum(jnp.square(values) * m) / cnt - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0), cnt


def _measure(kind: str, mean_in, var_in, cnt_in, mean_out, var_out, cnt_out):
    """Contrast measures (reference ``classics.py:13-98``); sign convention
    applied by the caller (lafarge: +, others: -)."""
    if kind == "lafarge":
        return jnp.sqrt(
            (var_out + var_in)
            / ((cnt_in + cnt_out) * jnp.square(mean_in - mean_out) + EPS)
        )
    if kind == "craciun":
        p1 = jnp.square(mean_in - mean_out) / (4 * jnp.sqrt(var_in + var_out) + EPS)
        p2 = -0.5 * jnp.log(
            (2 * jnp.sqrt(var_in * var_out) + EPS) / (var_in + var_out + EPS)
        )
        return p1 + p2
    if kind == "craciun2":
        return jnp.square(mean_in - mean_out) / (
            4 * jnp.sqrt(var_in + var_out) + EPS
        )
    if kind == "mean":
        return jnp.square(mean_in - mean_out)
    if kind == "t-test":
        return jnp.abs(mean_in - mean_out) / jnp.sqrt(
            var_in / cnt_in + var_out / cnt_out + EPS
        )
    raise ValueError(kind)


def contrast_energy_point(image: Array, xy: Array, marks: Array,
                          cfg: ContrastConfig) -> Array:
    """Contrast energy of one rectangle (vmap over slots).

    ``image`` is (H, W, 3) float; windows beyond borders read clamped edge
    pixels (negligible for interior objects, matching the reference's
    shape-clipped rasterisation in spirit).
    """
    h, w = image.shape[:2]
    window = cfg.window
    gy, gx = _window_grid(window)
    cy, cx = xy[0], xy[1]
    yi = jnp.clip(jnp.round(cy).astype(jnp.int32) - window // 2, 0, h - window)
    xi = jnp.clip(jnp.round(cx).astype(jnp.int32) - window // 2, 0, w - window)
    patch = jax.lax.dynamic_slice(image, (yi, xi, 0), (window, window, 3))
    # offsets of each window pixel from the true center
    py = yi + jnp.arange(window, dtype=jnp.float32)[:, None] - cy
    px = xi + jnp.arange(window, dtype=jnp.float32)[None, :] - cx
    py = jnp.broadcast_to(py, (window, window))
    px = jnp.broadcast_to(px, (window, window))

    size, ratio, angle = marks[0], marks[1], marks[2]
    length = 2 * size / (1 + ratio)  # long side
    width = ratio * length           # short side
    # rect frame: poly built with angle + pi/2 (geometry.marks_to_poly)
    a = angle + jnp.pi / 2
    cos, sin = jnp.cos(a), jnp.sin(a)
    u = cos * py + sin * px
    v = -sin * py + cos * px

    interior = _in_rect(u, v, length, width, pad=-float(cfg.erode))
    rim = _in_rect(u, v, length, width, pad=float(cfg.gap + cfg.dilation)) & ~_in_rect(
        u, v, length, width, pad=float(cfg.gap)
    )

    def per_channel(ch):
        mean_in, var_in, cnt_in = _masked_stats(ch, interior)
        mean_out, var_out, cnt_out = _masked_stats(ch, rim)
        return _measure(
            cfg.measure, mean_in, var_in, cnt_in, mean_out, var_out, cnt_out
        )

    fac = 1.0 if cfg.measure == "lafarge" else -1.0
    if cfg.rgb:
        val = sum(per_channel(patch[..., c]) for c in range(3))
    else:
        val = per_channel(jnp.mean(patch, axis=-1))
    default = 10.0 if cfg.measure == "lafarge" else 0.0
    ok = jnp.sum(interior) > 0
    return jnp.where(ok, fac * val - cfg.thresh, default)


def gradient_energy_point(grad_image: Array, xy: Array, marks: Array,
                          n_samples: int = 16, thresh: float = 0.0) -> Array:
    """Edge-normal gradient alignment (reference ``GradientEnergy``):
    sample points along each rectangle edge, dot the image gradient with the
    outward normal, return -|mean|."""
    h, w = grad_image.shape[:2]
    size, ratio, angle = marks[0], marks[1], marks[2]
    length = 2 * size / (1 + ratio)
    width = ratio * length
    a = angle + jnp.pi / 2
    cos, sin = jnp.cos(a), jnp.sin(a)
    rot = jnp.array([[cos, -sin], [sin, cos]])

    t = (jnp.arange(n_samples) + 0.5) / n_samples - 0.5  # (-0.5, 0.5)
    hu, hv = length / 2, width / 2
    # four edges in the local frame: (u, v) positions + outward normals
    e1 = jnp.stack([jnp.full_like(t, hu), t * width], -1)
    e2 = jnp.stack([jnp.full_like(t, -hu), t * width], -1)
    e3 = jnp.stack([t * length, jnp.full_like(t, hv)], -1)
    e4 = jnp.stack([t * length, jnp.full_like(t, -hv)], -1)
    pts_local = jnp.concatenate([e1, e2, e3, e4])  # (4n, 2)
    n1 = jnp.tile(jnp.array([[1.0, 0.0]]), (n_samples, 1))
    n2 = jnp.tile(jnp.array([[-1.0, 0.0]]), (n_samples, 1))
    n3 = jnp.tile(jnp.array([[0.0, 1.0]]), (n_samples, 1))
    n4 = jnp.tile(jnp.array([[0.0, -1.0]]), (n_samples, 1))
    normals_local = jnp.concatenate([n1, n2, n3, n4])

    pts = pts_local @ rot.T + xy[None, :]
    normals = normals_local @ rot.T
    yi = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), 0, w - 1)
    grads = grad_image[yi, xi]  # (4n, 2[, 3])
    if grads.ndim == 3:
        dots = jnp.einsum("pdc,pd->pc", grads, normals)
        val = jnp.mean(dots)
    else:
        val = jnp.mean(jnp.sum(grads * normals, axis=-1))
    return -jnp.abs(val) - thresh


def contrast_energy_points(image: Array, xy: Array, marks: Array,
                           cfg: ContrastConfig) -> Array:
    return jax.vmap(lambda p, m: contrast_energy_point(image, p, m, cfg))(
        xy, marks
    )


def gradient_energy_points(grad_image: Array, xy: Array, marks: Array,
                           thresh: float = 0.0) -> Array:
    return jax.vmap(
        lambda p, m: gradient_energy_point(grad_image, p, m, thresh=thresh)
    )(xy, marks)
