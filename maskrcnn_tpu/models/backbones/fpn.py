"""FPN neck + the three backbone families, unified behind one contract.

Backbone contract (mirrors the reference's class-attr protocol,
reference model/extractor/feature_pyramid_network.py:8-16):
``__call__(images, train) -> list of NHWC feature maps, fine→coarse``, plus
static attributes ``feat_strides`` / ``spatial_scales`` / ``anchor_scales``.

Reference quirks preserved (SURVEY §7 hard-part 7):
- upsample in the top-down path is nearest-neighbor ×2 (chainer
  ``F.unpooling_2d`` ksize 2 — feature_pyramid_network.py:58-65),
- P6 is a 1×1 stride-2 conv on P5 (NOT the paper's max-pool —
  feature_pyramid_network.py:32,68),
- lateral 1×1 then 3×3 *after* the sum.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from maskrcnn_tpu.models.backbones.resnet import ResNet50, Norm


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest ×2 upsample, NHWC — chainer unpooling_2d(ksize=2) semantics."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPNBackbone(nn.Module):
    """ResNet-50 + FPN → [P2, P3, P4, P5, P6], all ``channels`` wide."""

    channels: int = 256
    frozen_bn: bool = True
    dtype: Any = jnp.float32
    stem_s2d: bool = True

    feat_strides = (4, 8, 16, 32, 64)
    spatial_scales = tuple(1.0 / s for s in feat_strides)
    anchor_scales = (2.0, 4.0, 8.0, 16.0, 32.0)  # sizes [32..512] / 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = ResNet50(self.frozen_bn, dt, stem_s2d=self.stem_s2d,
                     name="resnet")(x, train)

        p5 = nn.Conv(self.channels, (1, 1), dtype=dt, name="toplayer")(c["c5"])
        p4 = nn.Conv(self.channels, (3, 3), padding=1, dtype=dt, name="conv_p4")(
            upsample2x_nearest(p5)
            + nn.Conv(self.channels, (1, 1), dtype=dt, name="lat_p4")(c["c4"])
        )
        p3 = nn.Conv(self.channels, (3, 3), padding=1, dtype=dt, name="conv_p3")(
            upsample2x_nearest(p4)
            + nn.Conv(self.channels, (1, 1), dtype=dt, name="lat_p3")(c["c3"])
        )
        p2 = nn.Conv(self.channels, (3, 3), padding=1, dtype=dt, name="conv_p2")(
            upsample2x_nearest(p3)
            + nn.Conv(self.channels, (1, 1), dtype=dt, name="lat_p2")(c["c2"])
        )
        p6 = nn.Conv(self.channels, (1, 1), strides=2, dtype=dt, name="conv_p6")(p5)
        return [p2, p3, p4, p5, p6]


class C4Backbone(nn.Module):
    """ResNet-50 truncated at res4, frozen BN — 1024ch stride-16 single level
    (reference model/extractor/c4_backbone.py:7-26)."""

    frozen_bn: bool = True
    dtype: Any = jnp.float32
    stem_s2d: bool = True

    feat_strides = (16,)
    spatial_scales = (1.0 / 16.0,)
    anchor_scales = (8.0, 16.0, 32.0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = ResNet50(self.frozen_bn, self.dtype, include_c5=False,
                     stem_s2d=self.stem_s2d, name="resnet")(x, train)
        return [c["c4"]]


class ConvBN(nn.Module):
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.out, (3, 3), padding=1, dtype=self.dtype)(x)
        # Darknet BN is trainable in the reference (darknet.py:13).
        h = Norm(frozen=False, dtype=self.dtype)(h, train)
        return nn.relu(h)


class DarknetBackbone(nn.Module):
    """Tiny 5-conv net, stride 16, 256ch out
    (reference model/extractor/darknet.py:19-60)."""

    dtype: Any = jnp.float32

    feat_strides = (16,)
    spatial_scales = (1.0 / 16.0,)
    anchor_scales = (4.0,)  # anchor_sizes=[64] / 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h = x.astype(dt)
        for i, ch in enumerate((16, 32, 64, 128, 256)):
            h = ConvBN(ch, dt, name=f"conv{i + 1}")(h, train)
            if i < 4:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return [h]


def build_backbone(name: str, channels: int, frozen_bn: bool, dtype,
                   remat: bool = False, stem_s2d: bool = True) -> nn.Module:
    if name == "fpn":
        cls, args = FPNBackbone, (channels, frozen_bn, dtype, stem_s2d)
    elif name == "c4":
        cls, args = C4Backbone, (frozen_bn, dtype, stem_s2d)
    elif name == "darknet":
        cls, args = DarknetBackbone, (dtype,)
    else:
        raise ValueError(f"unknown backbone {name!r}")
    if remat:
        # checkpoint backbone activations (recompute in backward) —
        # HBM-for-FLOPs trade that unlocks larger per-chip batches.
        cls = nn.remat(cls, static_argnums=(2,))
    return cls(*args)
