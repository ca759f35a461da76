"""MaskRCNN facade: backbone + RPN + head behind one flax module.

Spec: reference ``MaskRCNN(FasterRCNN)``
(chainer_maskrcnn/model/maskrcnn.py:23-312) — backbone/head selection,
forward with train/eval branching, two-pass predict. Differences by design:

- composition is config-driven (:52-124's string-keyed constructor branches
  → ``maskrcnn_tpu.config.Config`` presets),
- the module is FUNCTIONAL: no ``self.x`` feature caching for the second
  pass (:87 in fpn_roi_mask_head.py) — ``predict`` in
  ``maskrcnn_tpu/eval/predict.py`` threads features explicitly,
- pooling is the batched multilevel ROIAlign (one op for all ROIs/levels),
- everything is fixed-shape: proposals live in (B, R) padded slots.

Methods are exposed for composition via ``module.apply(..., method=...)``:
``extract``, ``rpn``, ``head_box``, ``head_full``, ``head_mask`` — the train
step and predict pipeline assemble them around the non-learned glue ops
(proposal generation, target sampling) which need no parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.models.backbones.fpn import build_backbone
from maskrcnn_tpu.models.heads import (
    FPNKeypointHead,
    FPNMaskHead,
    LightHead,
    Res5Head,
)
from maskrcnn_tpu.models.rpn import RPNHead
from maskrcnn_tpu.ops import multilevel_roi_align
from maskrcnn_tpu.ops.roi_align import multilevel_roi_align_train


_BACKBONE_STRIDES = {
    "fpn": (4, 8, 16, 32, 64),
    "c4": (16,),
    "darknet": (16,),
}


def backbone_geometry(cfg: Config) -> tuple[tuple[int, ...], tuple[float, ...]]:
    """Static (feat_strides, spatial_scales) for a config — usable before any
    module is bound (flax properties only resolve inside apply)."""
    strides = _BACKBONE_STRIDES[cfg.model.backbone]
    return strides, tuple(1.0 / s for s in strides)


def pyramid_shapes(cfg: Config, image_size: tuple[int, int]) -> list[tuple[int, int]]:
    """Exact per-level feature shapes for a static image bucket.

    P2..P5 divide exactly (image buckets must be multiples of 32 for FPN /
    16 for single-level backbones); P6 is a SAME-padded stride-2 1×1 conv on
    P5 (reference feature_pyramid_network.py:32,68) so it's ceil(P5/2) —
    naive ``h // 64`` is WRONG when h/32 is odd (e.g. 800 → P5=25 → P6=13).
    """
    h, w = image_size
    if cfg.model.backbone == "fpn":
        assert h % 32 == 0 and w % 32 == 0, "FPN buckets must be 32-aligned"
        shapes = [(h // s, w // s) for s in (4, 8, 16, 32)]
        shapes.append(((shapes[-1][0] + 1) // 2, (shapes[-1][1] + 1) // 2))
        return shapes
    assert h % 16 == 0 and w % 16 == 0, "buckets must be 16-aligned"
    return [(h // 16, w // 16)]


def build_head(cfg: Config, dtype) -> nn.Module:
    m = cfg.model
    if m.head == "fpn":
        return FPNMaskHead(m.n_class, m.n_mask_convs, dtype)
    if m.head == "fpn_keypoint":
        return FPNKeypointHead(m.n_class, m.n_keypoints, m.n_mask_convs,
                               dtype, getattr(m, "kp_upsample", "half_pixel"))
    if m.head == "light":
        return LightHead(m.n_class, compat_mask_bug=m.compat_mask_bug,
                         dtype=dtype)
    if m.head == "res5":
        return Res5Head(m.n_class, m.freeze_bn, dtype)
    raise ValueError(f"unknown head {m.head!r}")


class MaskRCNN(nn.Module):
    cfg: Config

    def setup(self):
        m = self.cfg.model
        dtype = jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32
        self.extractor = build_backbone(m.backbone, m.fpn_channels,
                                        m.freeze_bn, dtype, m.remat,
                                        m.stem_s2d)
        self.rpn_head = RPNHead(
            mid_channels=256,
            n_anchor=len(self.cfg.anchors.ratios),
            dtype=dtype,
        )
        self.head = build_head(self.cfg, dtype)

    # ---- static geometry -------------------------------------------------
    # derived from config, not the module instance: transformed (remat)
    # backbone classes may not carry the class attributes through.
    @property
    def feat_strides(self) -> tuple[int, ...]:
        return backbone_geometry(self.cfg)[0]

    @property
    def spatial_scales(self) -> tuple[float, ...]:
        return backbone_geometry(self.cfg)[1]

    def feat_shapes(self, img_size: tuple[int, int]) -> list[tuple[int, int]]:
        return pyramid_shapes(self.cfg, img_size)

    # ---- composable stages ------------------------------------------------
    def extract(self, images: jnp.ndarray, train: bool = False):
        """images (B, H, W, 3) → list of pyramid features (fine→coarse).

        Accepts float32 in [0, 1] or uint8 in [0, 255]: the COCO loader
        ships uint8 (¼ the host→device bytes, and the float canvas work —
        60% of host decode time — moves onto the chip, where the /255
        fuses into the stem conv). uint8→f32/255 is exact, so the two
        input forms are numerically identical.
        """
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        return self.extractor(images, train)

    def rpn(self, features):
        """features → (rpn_locs (B, A, 4), rpn_scores (B, A, 2))."""
        return self.rpn_head(features)

    def pool(self, features, rois, roi_batch_idx, roi_levels, out_size):
        """Batched multilevel ROIAlign over flattened (B·R,) ROI slots."""
        scales = self.spatial_scales
        if getattr(self.head, "needs_thin_map", False):
            features = [self.head.thin_map(features[0])]
            scales = (self.spatial_scales[0],)
        impl = self.cfg.model.roi_align
        if impl == "pallas":
            from maskrcnn_tpu.kernels import multilevel_roi_align_pallas

            return multilevel_roi_align_pallas(
                features, rois, roi_batch_idx, roi_levels, out_size, scales
            )
        return multilevel_roi_align(
            features, rois, roi_batch_idx, roi_levels, out_size, scales,
            impl=None if impl == "auto" else impl,
        )

    def head_box(self, features, rois, roi_batch_idx, roi_levels):
        """Pass-1 head: pooled box branch only → (locs, scores)."""
        pooled = self.pool(features, rois, roi_batch_idx, roi_levels,
                           (self.head.roi_size_box, self.head.roi_size_box))
        locs, scores, _ = self.head(pooled)
        return locs, scores

    def head_full(self, features, rois, roi_batch_idx, roi_levels,
                  train: bool = False):
        """Train-path head: box + mask branches → (locs, scores, masks)."""
        pooled_box = self.pool(
            features, rois, roi_batch_idx, roi_levels,
            (self.head.roi_size_box, self.head.roi_size_box))
        pooled_mask = self.pool(
            features, rois, roi_batch_idx, roi_levels,
            (self.head.roi_size_mask, self.head.roi_size_mask))
        if isinstance(self.head, Res5Head):
            return self.head(pooled_box, pooled_mask, train)
        return self.head(pooled_box, pooled_mask)

    def head_train(self, features, rois_bn, levels_bn, n_pos,
                   class_idx=None):
        """Train-path head over (B, n) ROI slots with positives FIRST:
        box branch on every slot + mask/keypoint branch on the (B, :n_pos)
        prefix → (locs, scores, masks).

        For FPN heads both branches pool from ONE shared region gather
        (:func:`maskrcnn_tpu.ops.roi_align.multilevel_roi_align_train`) —
        the region window is out-size independent, so the second
        gather/backward-scatter the reference pays
        (fpn_roi_mask_head.py:74-78 after :59-63) disappears. Single-level
        heads (light/res5/darknet) fall back to two pools.
        """
        b, n = rois_bn.shape[:2]
        fused = (
            self.cfg.model.roi_align in ("auto", "region", "fused")
            and len(features) > 1
            and not getattr(self.head, "needs_thin_map", False)
            and isinstance(self.head, (FPNMaskHead, FPNKeypointHead))
        )
        if fused:
            sb = self.head.roi_size_box
            sm = self.head.roi_size_mask
            # "fused" routes the region-gather VJP to the Pallas
            # tile-accumulator scatter (round-4: XLA's scatter was the
            # single hottest op of the train step at 18.5 GiB/s; fused
            # measured 56.8 vs 49.7 img/s end-to-end). "region" keeps the
            # pure-XLA backward as the A/B reference. "auto" picks fused
            # on TPU when the trace is per-device local: single device, or
            # inside a shard_map body (parallel/mesh.py spmd="shard_map"),
            # where every op sees its local shard and pallas_call is legal.
            # Multi-device GSPMD jit has no partitioning rule for
            # pallas_call, so those autos stay on the XLA scatter.
            # "auto" additionally requires the ON-CHIP numerics gate
            # (utils/kernel_gate.py): interpret-mode tests are not evidence
            # for Mosaic, so the fused path must have matched the XLA path
            # on this device kind once (cached per fingerprint) before it
            # becomes a default. Runs in a subprocess at first trace.
            import jax as _jax

            from maskrcnn_tpu.ops.roi_align import in_spmd_local_trace
            from maskrcnn_tpu.utils.kernel_gate import fused_kernel_verified

            use_pallas_bwd = self.cfg.model.roi_align == "fused" or (
                self.cfg.model.roi_align == "auto"
                and _jax.default_backend() == "tpu"
                and (len(_jax.devices()) == 1 or in_spmd_local_trace())
                and fused_kernel_verified()
            )
            pooled_box, pooled_mask = multilevel_roi_align_train(
                features, rois_bn, levels_bn, n_pos,
                (sb, sb), (sm, sm), self.spatial_scales,
                bwd_scatter="pallas" if use_pallas_bwd else "xla",
                acc_dtype=self.cfg.model.roi_align_acc,
            )
            locs, scores, _ = self.head(pooled_box)
            if class_idx is not None and isinstance(self.head, FPNMaskHead):
                masks = self.head.predict_mask(pooled_mask, class_idx)
            else:
                masks = self.head.predict_mask(pooled_mask)
            return locs, scores, masks
        rois = rois_bn.reshape(b * n, 4)
        levels = levels_bn.reshape(b * n)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        locs, scores = self.head_box(features, rois, batch_idx, levels)
        pos_rois = rois_bn[:, :n_pos].reshape(b * n_pos, 4)
        pos_lv = levels_bn[:, :n_pos].reshape(b * n_pos)
        pos_bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_pos)
        masks = self.head_mask(features, pos_rois, pos_bi, pos_lv, class_idx)
        return locs, scores, masks

    def head_mask(self, features, rois, roi_batch_idx, roi_levels,
                  class_idx=None):
        """Pass-2 head: mask branch on refined boxes (reference
        predict_mask, fpn_roi_mask_head.py:90-102). ``class_idx`` (FPN mask
        head only) evaluates just each ROI's class channel — the only one
        train/predict ever consume."""
        pooled = self.pool(features, rois, roi_batch_idx, roi_levels,
                           (self.head.roi_size_mask, self.head.roi_size_mask))
        if class_idx is not None and isinstance(self.head, FPNMaskHead):
            return self.head.predict_mask(pooled, class_idx)
        return self.head.predict_mask(pooled)

    # ---- default entry (single-chip forward, used by __graft_entry__) -----
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """Backbone + RPN forward (the jit-compilable core graph)."""
        features = self.extract(images, train)
        rpn_locs, rpn_scores = self.rpn(features)
        return features, rpn_locs, rpn_scores

    def init_forward(self, images: jnp.ndarray):
        """Touches every parameterized branch — use as the ``method=`` for
        ``module.init`` so backbone, RPN, AND head params all materialize."""
        features, rpn_locs, rpn_scores = self(images, train=False)
        h, w = images.shape[1], images.shape[2]
        rois = jnp.asarray(
            [[0.1 * h, 0.1 * w, 0.8 * h, 0.8 * w]] * 2, jnp.float32
        )
        batch_idx = jnp.zeros((2,), jnp.int32)
        levels = jnp.zeros((2,), jnp.int32)
        return self.head_full(features, rois, batch_idx, levels)


def prepare_image(img_chw, min_size: int = 600, max_size: int = 1000):
    """Host-side resize + /255 normalize (reference maskrcnn.py:261-276).

    Returns (img float32 HWC in [0,1], scale). NOTE the reference passes a
    pixel mean to its base class but actually divides by 255 (:130-131 vs
    :274) — we reproduce the /255 behavior.
    """
    import numpy as np
    import cv2

    c, h, w = img_chw.shape
    scale = min(min_size / min(h, w), max_size / max(h, w))
    img = img_chw.transpose(1, 2, 0)
    img = cv2.resize(img, (int(w * scale), int(h * scale)),
                     interpolation=cv2.INTER_LINEAR)
    return img.astype(np.float32) / 255.0, scale
