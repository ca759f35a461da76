"""ResNet-50 bottom-up backbone, NHWC, flax.linen.

Behavioral spec: chainer ``ResNet50Layers`` as consumed by the reference FPN
(reference chainer_maskrcnn/model/extractor/feature_pyramid_network.py:22,46-53)
and C4 backbone (c4_backbone.py:7-26):

- caffe-style bottlenecks: the downsampling stride sits on the FIRST 1×1 conv
  of each stage's first block (chainer resnet convention), not the 3×3 —
  preserved so a chainer-npz weight conversion is exact.
- stem: 7×7/2 conv → BN → relu → 2×2/2 max-pool (the reference pools with
  ksize 2, not the canonical 3×3/2 — feature_pyramid_network.py:48).
- ``freeze_bn``: BatchNorm always uses running statistics (the reference
  freezes BN for C4 via disable_update, c4_backbone.py:13-15; we default to
  frozen everywhere, the standard detection practice for small batches).

TPU notes: NHWC layout + channels padded to MXU-friendly multiples by
construction (64/256/512/1024/2048); conv compute in ``dtype`` (bfloat16 for
speed), params and BN stats in float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Norm(nn.Module):
    """BatchNorm that can be frozen (inference statistics always)."""

    frozen: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_running = self.frozen or not train
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=0.9,
            # chainer L.BatchNormalization default (2e-5) — kept so converted
            # reference/ImageNet weights reproduce the reference numerics.
            epsilon=2e-5,
            dtype=self.dtype,
        )(x)


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int = 1
    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        dt = self.dtype
        # caffe/chainer-style: stride on the first 1x1.
        h = nn.Conv(self.mid, (1, 1), strides=self.stride, use_bias=False, dtype=dt)(x)
        h = Norm(self.frozen_bn, dt)(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.mid, (3, 3), padding=1, use_bias=False, dtype=dt)(h)
        h = Norm(self.frozen_bn, dt)(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.out, (1, 1), use_bias=False, dtype=dt)(h)
        h = Norm(self.frozen_bn, dt)(h, train)
        if residual.shape[-1] != self.out or self.stride != 1:
            residual = nn.Conv(
                self.out, (1, 1), strides=self.stride, use_bias=False, dtype=dt,
                name="proj",
            )(x)
            residual = Norm(self.frozen_bn, dt, name="proj_bn")(residual, train)
        return nn.relu(h + residual.astype(h.dtype))


class ResStage(nn.Module):
    n_blocks: int
    mid: int
    out: int
    stride: int
    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_blocks):
            x = Bottleneck(
                self.mid,
                self.out,
                stride=self.stride if i == 0 else 1,
                frozen_bn=self.frozen_bn,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
        return x


class ResNet50(nn.Module):
    """Returns {'c2','c3','c4','c5'} feature maps (strides 4/8/16/32)."""

    frozen_bn: bool = True
    dtype: Any = jnp.float32
    include_c5: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=dt, name="conv1")(x.astype(dt))
        h = Norm(self.frozen_bn, dt, name="bn1")(h, train)
        h = nn.relu(h)
        # Reference pools ksize=2 stride=2 (feature_pyramid_network.py:48).
        h = nn.max_pool(h, (2, 2), strides=(2, 2))

        c2 = ResStage(3, 64, 256, 1, self.frozen_bn, dt, name="res2")(h, train)
        c3 = ResStage(4, 128, 512, 2, self.frozen_bn, dt, name="res3")(c2, train)
        c4 = ResStage(6, 256, 1024, 2, self.frozen_bn, dt, name="res4")(c3, train)
        out = {"c2": c2, "c3": c3, "c4": c4}
        if self.include_c5:
            out["c5"] = ResStage(3, 512, 2048, 2, self.frozen_bn, dt,
                                 name="res5")(c4, train)
        return out


class Res5Stage(nn.Module):
    """Standalone res5 with strides forced to 1, for the Res5 ROI head
    (reference model/head/resnet_roi_mask_head.py:25-29,61-65)."""

    frozen_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ResStage(3, 512, 2048, 1, self.frozen_bn, self.dtype,
                        name="res5")(x, train)
