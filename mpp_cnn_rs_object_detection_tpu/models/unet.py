"""U-Net backbone as a flax module, NHWC, TPU-friendly.

Rebuild of reference ``model_parts/unet/unet.py:24-60`` and
``unet_parts.py:12-76``: DoubleConv (3x3 conv + BN + ReLU, x2, reflect
padding), Down (2x2 maxpool), Up (2x2 stride-2 transposed conv + skip concat).
Differences from the torch original are layout only (NHWC so XLA tiles convs
onto the MXU; ``dtype`` selects bf16 compute with f32 params/statistics).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def infer_pad_hw(h: int, w: int) -> tuple:
    """(target_h, target_w) padding for whole-image CNN inference.

    Small inputs round to 64-multiples (2**depth alignment). Big scenes
    (max side > 256) round to SQUARE power-of-two sides so a whole val
    split shares one jitted forward program per model — each distinct
    (H, W) costs a full U-Net compile on the 1-core host, and with square
    pow2 buckets the CNN maps feed the exact-scene MPP at the very shape
    its chain program is bucketed to (``mpp/scene.py:scene_shape_bucket``).
    The pad is zero-filled bottom/right and cropped from the output, same
    as the 64-multiple path."""
    if max(h, w) <= 256:
        return -(-h // 64) * 64, -(-w // 64) * 64
    side = 256
    while side < max(h, w):
        side *= 2
    return side, side


def pad_before_infer(image: jnp.ndarray, depth: int):
    """Pad H, W (leading axes of an HWC image) to multiples of 2**depth.

    Mirrors reference ``unet.py:9-21`` (pads at the bottom/right; caller crops
    the output back). Returns (padded, (pad_h, pad_w)).
    """
    div = 2 ** depth
    h, w = image.shape[0], image.shape[1]
    pad_h = (div - h % div) % div
    pad_w = (div - w % div) % div
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)))
    return image, (pad_h, pad_w)


class DoubleConv(nn.Module):
    features: int
    mid_features: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.mid_features or self.features
        for feats in (mid, self.features):
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            x = nn.Conv(feats, (3, 3), padding="VALID", dtype=self.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, momentum=0.9
            )(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.features, dtype=self.dtype)(x, train)


class Up(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        in_feats = x.shape[-1]
        x = nn.ConvTranspose(
            in_feats // 2, (2, 2), strides=(2, 2), dtype=self.dtype
        )(x)
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype)(x, train)


class UNet(nn.Module):
    """Encoder/decoder; ``hidden_dims`` e.g. [32, 64, 128, 256] (configs)."""

    hidden_dims: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips: List[jnp.ndarray] = []
        for i, feats in enumerate(self.hidden_dims):
            if i == 0:
                x = DoubleConv(feats, dtype=self.dtype)(x, train)
            else:
                x = Down(feats, dtype=self.dtype)(x, train)
            skips.append(x)
        for feats, skip in zip(self.hidden_dims[::-1][1:], skips[::-1][1:]):
            x = Up(feats, dtype=self.dtype)(x, skip, train)
        return x

    @property
    def out_channels(self) -> int:
        return self.hidden_dims[0]


class PosNet(nn.Module):
    """U-Net + 1x1 head -> [vec_x, vec_y, mask_logit] (reference ``pos_net.py:9-36``)."""

    hidden_dims: Sequence[int]
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = UNet(self.hidden_dims, dtype=self.dtype)(x, train)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class ShapeNet(nn.Module):
    """U-Net + three 1x1 heads -> per-mark class logit maps
    (reference ``shape_net.py:12-54``)."""

    hidden_dims: Sequence[int]
    out_features: int = 3
    n_classes: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk = UNet(self.hidden_dims, dtype=self.dtype)(x, train)
        return [
            nn.Conv(self.n_classes, (1, 1), dtype=self.dtype)(trunk).astype(jnp.float32)
            for _ in range(self.out_features)
        ]


class DivClassifier(nn.Module):
    """Divergence of the (masked) vector field + 1x1 conv -> center logit map.

    Reference ``pos_net_model.py:76-80`` + ``torch_div.py:31-44``: input is
    ``concat([vec, sigmoid(mask_logit)])``; output is
    ``conv1x1(div_ij(vec) * sigmoid(mask))``.
    """

    @nn.compact
    def __call__(self, vec_and_mask):
        from mpp_cnn_rs_object_detection_tpu.ops.divergence import divergence_ij
        import jax

        vec = vec_and_mask[..., :2]
        mask = vec_and_mask[..., 2]
        div = jax.vmap(lambda v: divergence_ij([v[..., 0], v[..., 1]]))(vec)
        x = (div * mask)[..., None]
        return nn.Conv(1, (1, 1), dtype=jnp.float32)(x)[..., 0]
