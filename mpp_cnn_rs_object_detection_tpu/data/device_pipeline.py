"""Device-resident CNN training pipeline: patch stacks + on-device
augmentation + on-device label targets.

The reference regenerates a 16,384-patch dataset on disk every 8 epochs and
recomputes EDT/watershed targets in DataLoader workers every epoch
(``data/patch_making.py:19-167``, ``models/position_net/data_loaders.py:23-124``,
``models/shape_net/data_loaders.py:34-118``) — fine with a 16-core host,
hopeless on a 1-core one. The TPU-native pipeline instead:

  - extracts the sampled patches ONCE per regeneration into a uint8 array
    stack with fixed-capacity per-patch (centers, params) annotation arrays
    (no PNG round-trip);
  - ships the stack to the device, where the whole epoch runs as one
    ``lax.scan``: each batch is gathered from the resident stack, augmented
    (dihedral-8 + photometric jitter) and converted to training targets
    (nearest-center pointing fields / painted mark-class maps) entirely
    on-device — the per-pixel target math is O(M * P^2) broadcasting, exactly
    the shape of work the VPU eats;
  - the host's only per-epoch work is an index permutation.

Target semantics match ``data/label_processing.py`` (the host processors) and
are pinned by parity tests; geometric augmentation reuses the tested
``rot90_points``/``flip_points`` formulas. The photometric family replaces
host-only ops (CLAHE) with device-friendly equivalents (global contrast
stretch), documented divergence from the reference distribution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpp_cnn_rs_object_detection_tpu.data.dataset import (
    load_annotation,
    load_image,
)
from mpp_cnn_rs_object_detection_tpu.data.patch_samplers import (
    MixedSampler,
    ObjectSampler,
    UniformSampler,
)
from mpp_cnn_rs_object_detection_tpu.ops.mappings import ValueMapping
from mpp_cnn_rs_object_detection_tpu.utils.config import fetch_data_paths

Array = jnp.ndarray


# --------------------------------------------------------------------- host


@dataclass
class PatchStack:
    """A regenerated training set as arrays: images uint8 (N, P, P, 3),
    fixed-capacity annotations (centers/params padded to M with a valid
    mask)."""

    images: np.ndarray   # (N, P, P, 3) uint8
    centers: np.ndarray  # (N, M, 2) float32 (row, col)
    params: np.ndarray   # (N, M, 3) float32 (a, b, w)
    valid: np.ndarray    # (N, M) bool

    @property
    def n_patches(self) -> int:
        return self.images.shape[0]


def build_patch_stack(dataset: str, subset: str, n_patches: int,
                      patch_size: int, rng: np.random.Generator,
                      unf_weight: float = 0.33, obj_weight: float = 0.66,
                      sigma: float = 10.0, max_objects: int = 128,
                      copy_paste: dict = None,
                      ) -> PatchStack:
    """Sample + extract ``n_patches`` patches into arrays (the in-memory
    analog of ``make_patch_dataset``; same samplers, same label
    reassignment as ``patch_making._make_one_patch``). ``copy_paste``
    applies ``data/copy_paste.py`` to each extracted patch (train only —
    pass None for val stacks)."""
    paths = fetch_data_paths(dataset, subset)
    paste_bank = None
    if copy_paste:
        from mpp_cnn_rs_object_detection_tpu.data.copy_paste import (
            build_paste_bank,
        )

        paste_bank = build_paste_bank(paths["images"], paths["annotations"])
    sampler = MixedSampler(
        n_patches=n_patches,
        samplers=[
            UniformSampler(n_patches=n_patches, patch_size=patch_size, rng=rng),
            ObjectSampler(n_patches=n_patches, patch_size=patch_size, rng=rng,
                          sigma=sigma),
        ],
        weights=[unf_weight, obj_weight],
        rng=rng,
    )
    sampler.initialise(paths["images"], paths["annotations"], paths["metadata"])
    per_image = rng.multinomial(n=n_patches, pvals=sampler.sample_density_per_image)

    imgs = np.zeros((n_patches, patch_size, patch_size, 3), np.uint8)
    cen = np.zeros((n_patches, max_objects, 2), np.float32)
    par = np.zeros((n_patches, max_objects, 3), np.float32)
    val = np.zeros((n_patches, max_objects), bool)

    k = 0
    overflow = 0
    half = patch_size // 2
    for i, (img_path, ann_path) in enumerate(
        zip(paths["images"], paths["annotations"])
    ):
        if per_image[i] == 0:
            continue
        image = load_image(img_path)
        ann = load_annotation(ann_path)
        centers = np.asarray(ann["centers"], np.float64).reshape(-1, 2)
        params = np.asarray(ann["parameters"], np.float64).reshape(-1, 3)
        shape = np.array(image.shape[:2])
        # pad ONCE (extract_patch re-pads the whole source image for every
        # border patch — 90 GB of copies over a 16k-patch regeneration);
        # afterwards each patch is a pure uint8 slice
        padded_u8 = np.pad(
            (np.clip(image, 0, 1) * 255).astype(np.uint8),
            ((half, half), (half, half), (0, 0)),
        )
        for _ in range(int(per_image[i])):
            anchor = np.asarray(
                sampler.sample_patch_center(
                    image_id=i, shape=shape, centers=centers
                ),
                int,
            )
            imgs[k] = padded_u8[
                anchor[0] : anchor[0] + patch_size,
                anchor[1] : anchor[1] + patch_size,
            ]
            if len(centers):
                rel = centers - anchor + half
                keep = np.all((rel >= 0) & (rel < patch_size), axis=1)
                idx = np.where(keep)[0]
                p_cen, p_par = rel[idx], params[idx]
            else:
                p_cen = np.zeros((0, 2), np.float64)
                p_par = np.zeros((0, 3), np.float64)
            if paste_bank and rng.random() < float(copy_paste.get("p", 1.0)):
                from mpp_cnn_rs_object_detection_tpu.data.copy_paste import (
                    paste_objects,
                )

                n_lo, n_hi = copy_paste.get("n_range", [1, 4])
                pasted, p_cen, p_par, _, _ = paste_objects(
                    imgs[k].astype(np.float32) / 255.0, p_cen, p_par,
                    np.zeros(len(p_cen), np.int64),
                    np.zeros(len(p_cen), bool), paste_bank, rng,
                    n_paste=int(rng.integers(n_lo, n_hi + 1)),
                )
                imgs[k] = (np.clip(pasted, 0, 1) * 255).astype(np.uint8)
            m = min(len(p_cen), max_objects)
            overflow += len(p_cen) - m
            cen[k, :m] = p_cen[:m]
            par[k, :m] = p_par[:m]
            val[k, :m] = True
            k += 1
    if overflow:
        import logging

        logging.warning(
            f"patch stack dropped {overflow} objects over the "
            f"{max_objects}-object patch capacity"
        )
    return PatchStack(images=imgs, centers=cen, params=par, valid=val)


# ----------------------------------------------------- device: augmentation


def dihedral_image(img: Array, k: Array, f0: Array, f1: Array) -> Array:
    """Random square-dihedral transform: rot90^k then optional flips."""
    img = jax.lax.switch(k, [lambda x: x] + [
        (lambda kk: (lambda x: jnp.rot90(x, kk)))(kk) for kk in (1, 2, 3)
    ], img)
    img = jnp.where(f0, img[::-1], img)
    img = jnp.where(f1, img[:, ::-1], img)
    return img


def dihedral_points(centers: Array, angles: Array, p: int, k: Array,
                    f0: Array, f1: Array) -> Tuple[Array, Array]:
    """(row, col) points + rectangle angles under the same dihedral transform
    (closed forms of the iterated ``augmentation.rot90_points`` /
    ``flip_points`` maps for a square p x p patch)."""
    r, c = centers[..., 0], centers[..., 1]
    q = float(p - 1)
    rots = [
        (r, c, angles),
        (q - c, r, angles - jnp.pi / 2),
        (q - r, q - c, angles - jnp.pi),
        (c, q - r, angles - 3 * jnp.pi / 2),
    ]
    r2, c2, a2 = jax.lax.switch(k, [lambda rr=rr: rr for rr in rots])
    r2 = jnp.where(f0, q - r2, r2)
    a2 = jnp.where(f0, jnp.pi - a2, a2)
    c2 = jnp.where(f1, q - c2, c2)
    a2 = jnp.where(f1, -a2, a2)
    return jnp.stack([r2, c2], axis=-1), a2 % jnp.pi


def photometric_medium(key: jax.Array, img: Array) -> Array:
    """Device-side 'medium' photometric family: one of {global contrast
    stretch, RGB shift} (CLAHE stand-in), optional 3x3 blur, gaussian
    noise — mirroring the host pipeline's branch probabilities
    (``augmentation.py:149-170``)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    r = jax.random.uniform(k1)

    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    stretched = jnp.clip(mean + (img - mean) * 1.4, 0.0, 1.0)
    shifted = jnp.clip(img + jax.random.uniform(k2, (3,), minval=-0.08,
                                                maxval=0.08), 0.0, 1.0)
    img = jnp.where(r < 0.33, stretched, jnp.where(r < 0.66, shifted, img))

    blur = (
        img
        + jnp.roll(img, 1, 0) + jnp.roll(img, -1, 0)
        + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1)
    ) / 5.0
    img = jnp.where(jax.random.uniform(k3) < 0.2, blur, img)

    sigma = jax.random.uniform(k4, maxval=0.03)
    img = jnp.clip(img + sigma * jax.random.normal(k5, img.shape), 0.0, 1.0)
    return img


def augment_batch(key: jax.Array, imgs_u8: Array, centers: Array,
                  params: Array, valid: Array):
    """Dihedral + photometric augmentation of a gathered batch. Returns
    float32 images in [0, 1] and transformed (centers, params)."""
    b, p = imgs_u8.shape[0], imgs_u8.shape[1]
    keys = jax.random.split(key, b)

    def one(key_i, img_u8, cen, par, val):
        kk, kf0, kf1, kp = jax.random.split(key_i, 4)
        k = jax.random.randint(kk, (), 0, 4)
        f0 = jax.random.uniform(kf0) < 0.5
        f1 = jax.random.uniform(kf1) < 0.5
        img = img_u8.astype(jnp.float32) / 255.0
        img = dihedral_image(img, k, f0, f1)
        cen2, ang2 = dihedral_points(cen, par[:, 2], p, k, f0, f1)
        # host pipeline rounds augmented centers to ints
        # (augmentation.py:202)
        cen2 = jnp.trunc(cen2)
        par2 = par.at[:, 2].set(ang2)
        img = photometric_medium(kp, img)
        return img, cen2, par2, val

    return jax.vmap(one)(keys, imgs_u8, centers, params, valid)


# --------------------------------------------------------- device: targets


def _nearest_fields(centers: Array, valid: Array, p: int):
    """Per-pixel (nearest valid center index, distance); inf where no valid
    center (the device analog of ``label_processing.nearest_center_fields``)."""
    coor = jnp.stack(
        jnp.meshgrid(jnp.arange(p), jnp.arange(p), indexing="ij"), axis=-1
    ).astype(jnp.float32)  # (P, P, 2)
    d = jnp.linalg.norm(
        centers[:, None, None, :] - coor[None], axis=-1
    )  # (M, P, P)
    d = jnp.where(valid[:, None, None], d, jnp.inf)
    nearest = jnp.argmin(d, axis=0)
    dist = jnp.min(d, axis=0)
    return coor, nearest, dist


def pos_targets(centers: Array, params: Array, valid: Array, p: int,
                max_distance, sigma_dil: float = 0.6) -> Dict[str, Array]:
    """PosNet targets: unit pointing vectors + validity mask + dilated
    center map (parity with ``PosLabelProcessor`` mode 'uvec')."""
    coor, nearest, dist = _nearest_fields(centers, valid, p)
    target_center = centers[nearest]  # (P, P, 2)
    pointy = target_center - coor
    norm = jnp.where(jnp.isinf(dist), 1e6, dist) + 1e-8
    pointy = jnp.where(jnp.isinf(dist)[..., None], 0.0, pointy / norm[..., None])
    if max_distance == "auto":
        size_map = jnp.mean(params[nearest][..., :2], axis=-1)
        cut = size_map
    else:
        cut = float(max_distance)
    keep = norm <= cut
    pointy = jnp.where(keep[..., None], pointy, 0.0)
    bin_dil = jnp.exp(-0.5 * jnp.square(norm / sigma_dil))
    bin_dil = jnp.where(bin_dil < 1e-5, 0.0, bin_dil)
    return {
        "pointing_map": pointy.astype(jnp.float32),
        "mask": keep.astype(jnp.float32),
        "center_binary_map_dil": bin_dil.astype(jnp.float32),
    }


def _value_to_class(values: Array, m: ValueMapping) -> Array:
    step = (m.v_max - m.v_min) / m.n_classes
    cls = jnp.floor((values - m.v_min) / step).astype(jnp.int32)
    return jnp.clip(cls, 0, m.n_classes - 1)


def shape_targets(centers: Array, params: Array, valid: Array, p: int,
                  mappings: List[ValueMapping], mask_mode: str = "shapes",
                  mask_sigma="auto") -> Dict[str, Array]:
    """ShapeNet targets: painted per-pixel mark-class maps + normalised loss
    mask (parity with ``ShapeLabelProcessor``)."""
    a, b, w = params[:, 0], params[:, 1], params[:, 2]
    sra = jnp.stack([(a + b) / 2.0, a / (b + 1e-12), w % jnp.pi], axis=-1)
    classes = jnp.stack(
        [_value_to_class(sra[:, i], m) for i, m in enumerate(mappings)], axis=0
    )  # (3, M)

    if mask_mode == "shapes":
        coor = jnp.stack(
            jnp.meshgrid(jnp.arange(p), jnp.arange(p), indexing="ij"), axis=-1
        ).astype(jnp.float32)
        d = coor[None] - centers[:, None, None, :]  # (M, P, P, 2)
        cos, sin = jnp.cos(w), jnp.sin(w)
        lu = cos[:, None, None] * d[..., 0] + sin[:, None, None] * d[..., 1]
        lv = -sin[:, None, None] * d[..., 0] + cos[:, None, None] * d[..., 1]
        contains = (
            (jnp.abs(lu) <= a[:, None, None] / 2)
            & (jnp.abs(lv) <= b[:, None, None] / 2)
            & valid[:, None, None]
        )  # (M, P, P)
        m_idx = jnp.arange(contains.shape[0])[:, None, None]
        # the host painter overwrites in object order -> the LAST containing
        # object wins each pixel
        winner = jnp.max(jnp.where(contains, m_idx, -1), axis=0)
        any_obj = winner >= 0
        winner_safe = jnp.maximum(winner, 0)
        value_class_map = [
            jnp.where(any_obj, classes[i][winner_safe], 0).astype(jnp.int32)
            for i in range(len(mappings))
        ]
        count = jnp.sum(contains, axis=0).astype(jnp.float32)
        total = jnp.sum(count)
        loss_mask = jnp.where(total > 0, count / jnp.maximum(total, 1e-12), 0.0)
    elif mask_mode == "gaussian":
        _, nearest, dist = _nearest_fields(centers, valid, p)
        value_class_map = [
            classes[i][nearest].astype(jnp.int32) for i in range(len(mappings))
        ]
        size_map = jnp.asarray(
            mappings[0].feature_mapping, jnp.float32
        )[value_class_map[0]]
        sigma = (
            jnp.maximum(size_map / 4, 1e-8)
            if mask_sigma == "auto"
            else float(mask_sigma)
        )
        dist_f = jnp.where(jnp.isinf(dist), 1e6, dist)
        lm = jnp.exp(-0.5 * jnp.square(dist_f / sigma))
        lm = jnp.where(lm < 1e-3, 0.0, lm)
        total = jnp.sum(lm)
        loss_mask = jnp.where(total > 0, lm / jnp.maximum(total, 1e-12), 0.0)
    else:
        raise ValueError(mask_mode)
    return {
        "value_class_map": value_class_map,
        "loss_mask": loss_mask.astype(jnp.float32),
    }
