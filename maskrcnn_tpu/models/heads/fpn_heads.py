"""FPN ROI heads: box+mask and box+keypoint.

Specs:
- ``FPNMaskHead`` ← reference ``FPNRoIMaskHead``
  (chainer_maskrcnn/model/head/fpn_roi_mask_head.py:10-102): box branch =
  ROIAlign 7×7 → 3×3 conv256+relu → fc1024 → fc1024 → class-agnostic
  ``cls_loc`` (4) + ``score`` (n_class); mask branch = ROIAlign 14×14 →
  4× 3×3 conv256+relu → 2× deconv256 → 1×1 conv to n_class−1 (28² logits,
  note: NO relu between deconv and the final conv, :84).
- ``FPNKeypointHead`` ← reference ``FPNRoIKeypointHead``
  (fpn_roi_keypoint_head.py:10-111): same box branch; keypoint branch =
  ROIAlign 14×14 → n_mask_convs× conv256+relu → deconv×2 →
  1×1 conv to n_keypoints → bilinear ×2 resize → 56×56 heatmap logits
  (:83-93).

Heads operate on *pooled* ROI features (the facade does the pooling with the
batched multilevel ROIAlign); train-vs-eval branching and the reference's
stateful two-pass caching (``self.x`` at fpn_roi_mask_head.py:87) are
replaced by the functional two-pass in ``MaskRCNN.predict``.

TPU note: the (R, 7·7·C) @ (7·7·C, 1024) fc over all ROIs at once is one big
MXU matmul — this is where the reference's 256 per-ROI kernel launches
collapse to a single op.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class Deconv2x2(nn.Module):
    """2×2 stride-2 transposed conv as einsum + depth-to-space.

    Bit-identical to ``nn.ConvTranspose(features, (2, 2), strides=(2, 2))``
    with the same param names/shapes (drop-in for checkpoints and the
    chainer converter): kernel size == stride means output 2×2 blocks tile
    disjointly, so ``out[n, 2i+di, 2j+dj, o] = Σc x[n,i,j,c]·K[1−di,1−dj,c,o]``
    — one matmul + a reshape. XLA:CPU lowers the transposed-conv gradient to
    a scalar base-dilated convolution (8.5 s/step of the tiny train step on
    one core); this form is a plain dot_general everywhere, and on TPU it is
    straight MXU work with no dilation handling.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c_in, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype
        k = kernel[::-1, ::-1].astype(dt)  # ConvTranspose applies K flipped
        n, h, w, _ = x.shape
        y = jnp.einsum("nhwc,ijco->nhiwjo", x.astype(dt), k)
        y = y.reshape(n, h * 2, w * 2, self.features)
        return y + bias.astype(dt)


class BoxBranch(nn.Module):
    """Shared box branch: conv3×3(256)+relu → fc1024 → fc1024 → loc/score."""

    n_class: int
    n_loc: int = 4  # class-agnostic (reference cls_loc out=4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        """pooled (R, S, S, C) → (locs (R, n_loc), scores (R, n_class))."""
        dt = self.dtype
        h = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt, name="conv1")(pooled))
        h = h.reshape(h.shape[0], -1)
        h = nn.relu(nn.Dense(1024, dtype=dt, name="fc1")(h))
        h = nn.relu(nn.Dense(1024, dtype=dt, name="fc2")(h))
        locs = nn.Dense(self.n_loc, dtype=dt, name="cls_loc")(h)
        scores = nn.Dense(self.n_class, dtype=dt, name="score")(h)
        return locs.astype(jnp.float32), scores.astype(jnp.float32)


class MaskBranch(nn.Module):
    """4× conv256 → deconv×2 → 1×1 conv to n_out; 14² in → 28² out.

    When ``class_idx`` is given, the final 1×1 conv evaluates ONLY each
    ROI's class channel (a per-ROI dot with that class's filters) —
    training and the second predict pass both use exactly one channel per
    ROI, so materializing all n_out channels (126 MB at 512×28²×79 f32,
    plus a take_along_axis gather) is pure waste. Identical numerics.
    """

    n_out: int
    n_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: jnp.ndarray, class_idx: jnp.ndarray | None = None):
        dt = self.dtype
        h = pooled
        for i in range(self.n_convs):
            h = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt,
                                name=f"mask{i + 1}")(h))
        h = Deconv2x2(256, dtype=dt, name="deconv1")(h)
        # Reference applies conv2 directly on the deconv output (no relu).
        # Explicit params so the full and class-gathered paths share them.
        c_in = h.shape[-1]
        w = self.param("conv2_kernel", nn.initializers.lecun_normal(),
                       (c_in, self.n_out))
        b = self.param("conv2_bias", nn.initializers.zeros, (self.n_out,))
        if class_idx is None:
            out = jnp.einsum("rhwc,co->rhwo", h, w.astype(dt)) + b.astype(dt)
            return out.astype(jnp.float32)
        idx = jnp.clip(class_idx, 0, self.n_out - 1)
        w_sel = w[:, idx].T.astype(dt)  # (R, c_in)
        b_sel = b[idx].astype(dt)  # (R,)
        out = jnp.einsum("rhwc,rc->rhw", h, w_sel) + b_sel[:, None, None]
        return out.astype(jnp.float32)


class FPNMaskHead(nn.Module):
    n_class: int  # includes background
    n_mask_convs: int = 4
    dtype: Any = jnp.float32

    mask_size = 28
    roi_size_box = 7
    roi_size_mask = 14
    class_agnostic_loc = True

    def setup(self):
        self.box = BoxBranch(self.n_class, 4, self.dtype)
        self.mask = MaskBranch(self.n_class - 1, self.n_mask_convs, self.dtype)

    def __call__(self, pooled_box, pooled_mask=None, class_idx=None):
        locs, scores = self.box(pooled_box)
        if pooled_mask is None:
            return locs, scores, None
        return locs, scores, self.mask(pooled_mask, class_idx)

    def predict_mask(self, pooled_mask, class_idx=None):
        return self.mask(pooled_mask, class_idx)


def _upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear ×2 with align_corners=True (chainer F.resize_images
    semantics): out[i] samples in-coordinate i·(n−1)/(2n−1). Expressed as
    two small interpolation matmuls (n is the 28-px heatmap side)."""
    r, hh, ww, c = x.shape

    def mat(n):
        coords = jnp.arange(2 * n) * (n - 1) / (2 * n - 1)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        w_hi = coords - lo
        m = jnp.zeros((2 * n, n))
        m = m.at[jnp.arange(2 * n), lo].add(1.0 - w_hi)
        m = m.at[jnp.arange(2 * n), hi].add(w_hi)
        return m

    x = jnp.einsum("ih,rhwc->riwc", mat(hh), x)
    return jnp.einsum("jw,riwc->rijc", mat(ww), x)


class KeypointBranch(nn.Module):
    """n_convs× conv256 → deconv×2 → 1×1 conv(n_keypoints) → bilinear ×2.

    14² pooled → 28² deconv → 56² resized heatmap logits
    (reference fpn_roi_keypoint_head.py:83-93)."""

    n_keypoints: int
    n_convs: int = 8
    dtype: Any = jnp.float32
    # chainer F.resize_images is bilinear align_corners=True; JAX's
    # 'linear' is half-pixel. Sub-pixel divergence on a 2x heatmap
    # upsample — "align_corners" reproduces chainer exactly for parity
    # sweeps; the measured OKS-AP delta is recorded in BASELINE.md.
    upsample: str = "half_pixel"  # or "align_corners"

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        dt = self.dtype
        h = pooled
        for i in range(self.n_convs):
            h = nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=dt,
                                name=f"mask{i + 1}")(h))
        h = Deconv2x2(256, dtype=dt, name="deconv1")(h)
        h = nn.Conv(self.n_keypoints, (1, 1), dtype=dt, name="conv2")(h)
        h = h.astype(jnp.float32)
        r, hh, ww, c = h.shape
        if self.upsample == "align_corners":
            return _upsample2x_align_corners(h)
        return jax.image.resize(h, (r, 2 * hh, 2 * ww, c), method="linear")


class FPNKeypointHead(nn.Module):
    n_class: int
    n_keypoints: int = 17
    n_mask_convs: int = 8
    dtype: Any = jnp.float32
    upsample: str = "half_pixel"

    mask_size = 56
    roi_size_box = 7
    roi_size_mask = 14
    class_agnostic_loc = True

    def setup(self):
        self.box = BoxBranch(self.n_class, 4, self.dtype)
        self.mask = KeypointBranch(self.n_keypoints, self.n_mask_convs,
                                   self.dtype, self.upsample)

    def __call__(self, pooled_box, pooled_mask=None):
        locs, scores = self.box(pooled_box)
        if pooled_mask is None:
            return locs, scores, None
        return locs, scores, self.mask(pooled_mask)

    def predict_mask(self, pooled_mask):
        return self.mask(pooled_mask)
