"""Res5 ROI head — ResNet stage-5 on pooled features.

Spec: reference ``ResnetRoIMaskHead``
(chainer_maskrcnn/model/head/resnet_roi_mask_head.py:11-73): ROIAlign 7×7 on
the C4 feature → res5 block with strides forced to 1 (:25-29) → 3×3
conv2048+relu → global average pool → PER-CLASS ``cls_loc`` (n_class·4,
unlike the other heads) + ``score``; mask branch: deconv256+relu → 3×3 conv
to n_class−1 at 14². Single-pass: train and eval share the same path
(:56-73) — no predict_mask second pass in the reference; we keep a
``predict_mask`` anyway so the facade's two-pass predict works uniformly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from maskrcnn_tpu.models.heads.fpn_heads import Deconv2x2
import jax.numpy as jnp

from maskrcnn_tpu.models.backbones.resnet import Res5Stage


class Res5Head(nn.Module):
    n_class: int
    frozen_bn: bool = True
    dtype: Any = jnp.float32

    mask_size = 14
    roi_size_box = 7
    roi_size_mask = 7
    class_agnostic_loc = False  # reference uses n_class*4 loc outputs (:49)

    def setup(self):
        self.res5 = Res5Stage(self.frozen_bn, self.dtype)
        self.conv1 = nn.Conv(2048, (3, 3), padding=1, dtype=self.dtype)
        self.cls_loc = nn.Dense(self.n_class * 4, dtype=self.dtype)
        self.score = nn.Dense(self.n_class, dtype=self.dtype)
        self.deconv1 = Deconv2x2(256, dtype=self.dtype)
        self.conv2 = nn.Conv(self.n_class - 1, (3, 3), padding=1,
                             dtype=self.dtype)

    def _trunk(self, pooled, train: bool = False):
        h = nn.relu(self.res5(pooled, train))
        return nn.relu(self.conv1(h))

    def __call__(self, pooled_box, pooled_mask=None, train: bool = False):
        h = self._trunk(pooled_box, train)
        gap = h.mean(axis=(1, 2))
        locs = self.cls_loc(gap).astype(jnp.float32)
        scores = self.score(gap).astype(jnp.float32)
        if pooled_mask is None:
            return locs, scores, None
        # Reference computes the mask from the SAME trunk output (box pool
        # == mask pool here, both 7×7).
        mask = self.conv2(nn.relu(self.deconv1(h))).astype(jnp.float32)
        return locs, scores, mask

    def predict_mask(self, pooled_mask, train: bool = False):
        h = self._trunk(pooled_mask, train)
        return self.conv2(nn.relu(self.deconv1(h))).astype(jnp.float32)
