"""Light-Head R-CNN head (arXiv:1711.07264).

Spec: reference ``LightRoIMaskHead``
(chainer_maskrcnn/model/head/light_roi_mask_head.py:11-127): a "thin feature
map" built from two large-separable-conv paths on the single-level backbone
feature — (15,1)→(1,15) and (1,15)→(15,1), C_mid=256, C_out=490, summed with
NO activation (:85-89) — then ROIAlign 7×7 → fc2048+relu → class-agnostic
``cls_loc``(4) + ``score``; mask branch 3× conv256 → deconv to n_class−1
at 14².

Reference bug policy (SURVEY §7 hard-part 7): the reference computes the three
mask convs then DISCARDS them, deconvolving the raw pool instead
(:101-104). Default here is the fixed behavior (convs feed the deconv);
``compat_mask_bug=True`` reproduces the reference graph for checkpoint
parity.

TPU note: the separable k=15 convs are long skinny convolutions — XLA maps
them onto the MXU fine since C_mid/C_out are large; the thin map is computed
ONCE per image (not per ROI), which is the whole point of Light-Head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from maskrcnn_tpu.models.heads.fpn_heads import Deconv2x2
import jax.numpy as jnp


class ThinFeatureMap(nn.Module):
    c_mid: int = 256
    c_out: int = 490
    k: int = 15
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = self.dtype
        p = self.k // 2
        left = nn.Conv(self.c_mid, (self.k, 1), padding=((p, p), (0, 0)),
                       dtype=dt, name="conv_ul")(x)
        left = nn.Conv(self.c_out, (1, self.k), padding=((0, 0), (p, p)),
                       dtype=dt, name="conv_bl")(left)
        right = nn.Conv(self.c_mid, (1, self.k), padding=((0, 0), (p, p)),
                        dtype=dt, name="conv_ur")(x)
        right = nn.Conv(self.c_out, (self.k, 1), padding=((p, p), (0, 0)),
                        dtype=dt, name="conv_br")(right)
        return left + right  # no activation (reference :89)


class LightHead(nn.Module):
    n_class: int
    compat_mask_bug: bool = False
    dtype: Any = jnp.float32

    mask_size = 14
    roi_size_box = 7
    roi_size_mask = 7  # same 7×7 pool feeds box and mask branches
    class_agnostic_loc = True
    # The facade must run ThinFeatureMap on backbone features BEFORE pooling.
    needs_thin_map = True

    def setup(self):
        self.thin = ThinFeatureMap(dtype=self.dtype)
        self.fc = nn.Dense(2048, dtype=self.dtype)
        self.cls_loc = nn.Dense(4, dtype=self.dtype)
        self.score = nn.Dense(self.n_class, dtype=self.dtype)
        self.conv2 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)
        self.conv3 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)
        self.conv4 = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype)
        self.deconv1 = Deconv2x2(self.n_class - 1, dtype=self.dtype)

    def thin_map(self, feature: jnp.ndarray) -> jnp.ndarray:
        return self.thin(feature)

    def __call__(self, pooled_box, pooled_mask=None):
        h = nn.relu(self.fc(pooled_box.reshape(pooled_box.shape[0], -1)))
        locs = self.cls_loc(h).astype(jnp.float32)
        scores = self.score(h).astype(jnp.float32)
        if pooled_mask is None:
            return locs, scores, None
        return locs, scores, self._mask(pooled_mask)

    def _mask(self, pool):
        if self.compat_mask_bug:
            # Reference :104 — convs discarded, deconv on the raw pool.
            return self.deconv1(pool).astype(jnp.float32)
        m = nn.relu(self.conv2(pool))
        m = nn.relu(self.conv3(m))
        m = nn.relu(self.conv4(m))
        return self.deconv1(m).astype(jnp.float32)

    def predict_mask(self, pooled_mask):
        return self._mask(pooled_mask)
