"""Dihedral-group (D4) test-time augmentation for the CNN energy maps.

The detector's inputs are nadir satellite images: the scene statistics are
invariant under the 8 symmetries of the pixel grid (4 rotations x optional
flip), but a single U-Net forward is not. Averaging the predicted maps over
the group is a classic variance-reduction ensemble — it needs no retraining
and batches naturally on TPU (the 8 variants are one shape).

No reference equivalent (extension; the reference runs one forward per image,
``pos_net_model.py:177-232``). Default-off via the posnet/shapenet config key
``inference.tta``.

Conventions: arrays are (H, W, ...) with axis 0 = row (y), axis 1 = col (x).
A group element is ``(k, flip)`` = flip-up-down first (if ``flip``), then
``k`` counter-clockwise quarter turns (numpy ``rot90`` on axes (0, 1)).

Angles: annotation angles are ``atan2(d_col, d_row) mod pi``
(``ops/geometry.py:polygon_to_abw``). Under ``(k, flip)`` an angle maps to
``s*angle + k*pi/2 (mod pi)`` with ``s = -1 if flip else +1``; with ``C``
even equal-width bins on [0, pi) this is an EXACT permutation of bin centers
(pinned against the polygon machinery in ``tests/test_tta.py``).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np

# all 8 group elements (identity first)
D4_ELEMENTS: Tuple[Tuple[int, bool], ...] = tuple(
    (k, flip) for flip in (False, True) for k in range(4)
)


def transform_image(arr: np.ndarray, k: int, flip: bool) -> np.ndarray:
    """Apply (k, flip) to an (H, W, ...) array: flipud first, then rot90^k."""
    if flip:
        arr = arr[::-1]
    return np.rot90(arr, k, axes=(0, 1))


def inverse_transform_map(arr: np.ndarray, k: int, flip: bool) -> np.ndarray:
    """Pull an (H', W', ...) map predicted in the transformed frame back to
    the original frame (inverse of :func:`transform_image`)."""
    arr = np.rot90(arr, -k, axes=(0, 1))
    if flip:
        arr = arr[::-1]
    return arr


def transform_points(pts: np.ndarray, h: int, w: int, k: int, flip: bool
                     ) -> np.ndarray:
    """Map (N, 2) ``(row, col)`` points of an (h, w) image into the
    transformed image's coordinates (same convention as transform_image:
    ``out[transform_points(p)] == in[p]``)."""
    pts = np.asarray(pts, np.float64).reshape(-1, 2).copy()
    if flip:
        pts[:, 0] = (h - 1) - pts[:, 0]
    for _ in range(k % 4):
        # np.rot90 once: out[W-1-c, r] = in[r, c] for an (h, w) input
        pts = np.stack([(w - 1) - pts[:, 1], pts[:, 0]], axis=-1)
        h, w = w, h
    return pts


def angle_gather_indices(n_classes: int, k: int, flip: bool) -> np.ndarray:
    """Index array ``g`` so that ``dist_original = dist_transformed[..., g]``.

    Output bin ``i`` (original-frame angle bin) reads the transformed-frame
    bin holding ``s*center_i + k*pi/2``: ``(i + k*C/2) mod C`` unflipped,
    ``(k*C/2 - i - 1) mod C`` flipped. Requires ``C`` even.
    """
    assert n_classes % 2 == 0, "angle TTA needs an even bin count"
    i = np.arange(n_classes)
    shift = (k % 4) * (n_classes // 2)
    if flip:
        return (shift - i - 1) % n_classes
    return (i + shift) % n_classes


def tta_scalar_map(infer_fn: Callable[[np.ndarray], np.ndarray],
                   image: np.ndarray,
                   elements: Sequence[Tuple[int, bool]] = D4_ELEMENTS,
                   ) -> np.ndarray:
    """Mean over the group of ``pullback(infer_fn(transform(image)))`` for a
    scalar (H, W) map (the posnet detection map)."""
    acc = None
    for k, flip in elements:
        m = inverse_transform_map(
            np.asarray(infer_fn(transform_image(image, k, flip))), k, flip
        )
        acc = m if acc is None else acc + m
    return acc / float(len(elements))


def tta_dist_maps(infer_fn: Callable[[np.ndarray], List[np.ndarray]],
                  image: np.ndarray,
                  cyclic: Sequence[bool],
                  elements: Sequence[Tuple[int, bool]] = D4_ELEMENTS,
                  ) -> List[np.ndarray]:
    """Mean over the group of the per-pixel categorical maps ``[(H, W, C)]``.

    ``cyclic[m]`` marks the angle map: its channel axis is permuted by the
    group action on [0, pi) bins; non-cyclic marks (size, ratio) are
    invariant and only pull back spatially.
    """
    acc: List[np.ndarray] = None
    for k, flip in elements:
        outs = infer_fn(transform_image(image, k, flip))
        pulled = []
        for m, d in enumerate(outs):
            d = inverse_transform_map(np.asarray(d), k, flip)
            if cyclic[m]:
                d = d[..., angle_gather_indices(d.shape[-1], k, flip)]
            pulled.append(d)
        if acc is None:
            acc = pulled
        else:
            acc = [a + p for a, p in zip(acc, pulled)]
    return [a / float(len(elements)) for a in acc]
