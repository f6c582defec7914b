"""ResNet backbones + FPN in flax (NHWC, bf16-friendly).

TPU-native rebuild of the backbones the reference's baseline detectors sit
on: torchvision ``resnet50`` inside ``fasterrcnn_resnet50_fpn``
(``models/fasterRCNN/faster_rcnn_model.py:40-57``) and the vendored
``bbav_models/resnet.py`` (``resnet101``) under CTRBOX
(``bbav_models/ctrbox_net.py:8-24``). Standard bottleneck/basic blocks; the
stage channel plan (64/128/256/512 x expansion) matches, strides give the
usual /4 /8 /16 /32 pyramid. No pretrained weights are loadable in this
environment, so the models train from scratch (configs use smaller depths
for the sample-scale datasets).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray

# depth -> (block kind, per-stage block counts)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype
        )
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype
        )
        out_feat = self.features * 4
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(out_feat, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape[-1] != out_feat or self.stride != 1:
            residual = nn.Conv(
                out_feat, (1, 1), (self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns the C2..C5 feature pyramid (strides 4, 8, 16, 32)."""

    depth: int = 50
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[Array]:
        kind, counts = RESNET_SPECS[self.depth]
        block = BasicBlock if kind == "basic" else Bottleneck
        y = nn.Conv(self.width, (7, 7), (2, 2), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype)(y))
        y = nn.max_pool(y, (3, 3), (2, 2), padding="SAME")
        feats = []
        for stage, n_blocks in enumerate(counts):
            width = self.width * (2 ** stage)
            for i in range(n_blocks):
                stride = 2 if (i == 0 and stage > 0) else 1
                y = block(width, stride=stride, dtype=self.dtype)(y, train)
            feats.append(y)
        return feats  # [C2 /4, C3 /8, C4 /16, C5 /32]

    @property
    def out_channels(self) -> Tuple[int, ...]:
        kind, _ = RESNET_SPECS[self.depth]
        mult = 1 if kind == "basic" else 4
        return tuple(self.width * (2 ** s) * mult for s in range(4))


class FPN(nn.Module):
    """Feature Pyramid Network over C2..C5 -> P2..P5 (+P6 via stride-2 pool),
    as in torchvision's ``fasterrcnn_resnet50_fpn``."""

    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> List[Array]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(f)
            for f in feats
        ]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jnp.repeat(jnp.repeat(outs[0], 2, axis=1), 2, axis=2)
            up = up[:, : lat.shape[1], : lat.shape[2]]
            outs.insert(0, lat + up)
        outs = [
            nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(o)
            for o in outs
        ]
        p6 = nn.max_pool(outs[-1], (1, 1), (2, 2))
        return outs + [p6]  # [P2, P3, P4, P5, P6]


class CombinationModule(nn.Module):
    """CTRBOX decoder block: upsample the deep feature, refine the skip, sum
    (reference ``bbav_models/model_parts.py`` CombinationModule with
    batch_norm=True)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, deep: Array, skip: Array, train: bool):
        norm = lambda: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype
        )
        up = jnp.repeat(jnp.repeat(deep, 2, axis=1), 2, axis=2)
        up = up[:, : skip.shape[1], : skip.shape[2]]
        up = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(up)
        up = nn.relu(norm()(up))
        sk = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(skip)
        sk = nn.relu(norm()(sk))
        return up + sk
