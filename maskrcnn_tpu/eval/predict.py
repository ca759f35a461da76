"""Two-pass inference: boxes first, then masks on refined boxes.

Spec: reference ``MaskRCNN.predict`` (chainer_maskrcnn/model/maskrcnn.py:157-259):
pass 1 runs backbone+RPN+box branch, boxes are decoded
(loc · std + mean → loc2bbox → clip, :189-203), per-class score-threshold +
NMS 0.3 (``_suppress``, :278-312, on HOST in the reference), then pass 2
pools the REFINED boxes for the mask branch (:215-229).

TPU-native differences:
- everything incl. the per-class NMS runs on device with static shapes:
  detections live in ``max_detections`` padded slots,
- per-class NMS is EXACT ``_suppress`` semantics: every (ROI, class) pair
  above ``score_thresh`` enters its class's NMS (no candidate cap — the
  reference's Python loop over classes becomes one ``vmap`` over the class
  axis; per class at most R=``n_test_post_nms`` candidates exist, so the
  IoU work is n_fg · R² — smaller than one joint pool would need),
- a global top-``max_detections`` by score is taken at the end (standard
  COCO convention; the reference concatenates all classes uncapped — set
  ``eval.max_detections`` higher for uncapped-equivalent output). Per class
  only the top-``max_detections`` kept boxes can reach the global top-k, so
  the per-class slot count ``min(R, max_detections)`` loses nothing,
- the reference's off-by-one quirk of skipping the LAST fg class during
  mask prediction (:287-291, a workaround kept in its code) is fixed here —
  every fg class is eligible (SURVEY §7 hard-part 7 policy: fix bugs),
- mask pass-2 pyramid levels: ``cfg.eval.mask_levels`` selects between the
  reference's exact behavior — pool masks at the levels of the PASS-1 ROIs
  that produced each detection (maskrcnn.py:215-229 threads ``levels``
  into ``predict_mask``) — and recomputing levels from the refined boxes
  ("refined"). Default is "pass1" for reference parity; the A/B delta is
  recorded in BASELINE.md.

TWO EXECUTION PATHS, selected by a startup PROBE (overridable by
``MASKRCNN_HEALTHY_TPU``):

- healthy (probe passes; always on non-TPU platforms; force with ``=1``):
  ONE jitted executable using native gathers (``take_along_axis`` /
  advanced indexing) — the idiomatic XLA form.
- workaround (probe fails on this TPU; force with ``=0``): FOUR jitted
  stages with one-hot contractions instead of gathers. This
  environment's libtpu faults ("TPU worker process crashed") when
  several gather lowerings or the vmapped per-class NMS compile into one
  executable (minimal repro: two fused ``take_along_axis`` on
  (8,79,300,·) inputs). The split costs two dispatches on ~4 MB of
  intermediates. Both paths are asserted equal on CPU in
  tests/test_eval.py.

The probe (``utils/tpu_probe.py``) runs the minimal two-gather repro in a
subprocess once per (jax, jaxlib, device kind) and caches the verdict, so
healthy TPUs automatically get the single-jit path.

The per-class NMS batch loop stays ``lax.map`` (sequential) on BOTH paths:
a batch-vmapped form materializes (B, n_fg, R, R) IoU tensors — 4.5 GB at
B=8/n_fg=79/R=300 — a memory decision independent of the libtpu fault.

Host-side mask pasting / keypoint decoding live in ``postprocess.py``.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.models import MaskRCNN, anchors_for, generate_proposals
from maskrcnn_tpu.models.maskrcnn import backbone_geometry, pyramid_shapes
from maskrcnn_tpu.ops import (
    clip_boxes,
    loc2bbox,
    map_rois_to_fpn_levels,
    nms_padded,
)


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, D, 4) yxyx in network-input coords
    scores: jnp.ndarray  # (B, D)
    labels: jnp.ndarray  # (B, D) int32, 0-based fg class
    valid: jnp.ndarray  # (B, D) bool
    masks: jnp.ndarray | None  # (B, D, S, S) sigmoid probs (mask heads)
    heatmaps: jnp.ndarray | None  # (B, D, S, S, K) logits (keypoint head)


def _use_healthy_path() -> bool:
    flag = os.environ.get("MASKRCNN_HEALTHY_TPU")
    if flag is not None:
        return flag == "1"
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform != "tpu":
        return True
    # On TPU the 4-stage path is the default even on gather-healthy
    # chips: a round-5 A/B on a healthy v5e measured the single-jit
    # path SLOWER (p50 43.5 ms vs 35.5 ms at 800×1024 b1, BASELINE.md
    # round 5) — XLA schedules the split stages better than the fused
    # executable, so the "3 extra dispatches tax" is negative. The env
    # var remains to force the single-jit path (at the forcer's own risk
    # on an unvetted libtpu — probe first: python -m
    # maskrcnn_tpu.utils.tpu_probe).
    return False


def make_predict_fn(cfg: Config, model: MaskRCNN, image_size=None):
    """Jitted ``(variables, images, img_hw, scale) -> Detections``."""
    h, w = image_size or cfg.train.image_size
    feat_strides, _ = backbone_geometry(cfg)
    feat_shapes = pyramid_shapes(cfg, (h, w))
    anchors = jnp.asarray(anchors_for(cfg, feat_shapes, feat_strides))
    n_levels = len(feat_shapes)
    is_keypoint = cfg.model.head == "fpn_keypoint"
    d = cfg.eval.max_detections
    mean = jnp.asarray(cfg.sampler.loc_normalize_mean, jnp.float32)
    std = jnp.asarray(cfg.sampler.loc_normalize_std, jnp.float32)
    n_fg = cfg.model.n_fg_class
    r_test = cfg.proposals.n_test_post_nms
    # per-class kept slots: only the top-d kept of a class can reach the
    # global top-d (kept boxes come out score-sorted), so min(R, d) is exact.
    n_keep_pc = min(r_test, d)
    pass1_levels = cfg.eval.mask_levels == "pass1"
    healthy = _use_healthy_path()

    # ---------------- stage bodies (plain functions, jitted per-path) -----

    def decode_body(variables, images, img_hw, scale):
        """Backbone + RPN + box head + per-class box decode."""
        b = images.shape[0]
        features, rpn_locs, rpn_scores = model.apply(variables, images, False)

        props = generate_proposals(
            rpn_locs, rpn_scores, anchors, scale, img_hw,
            n_pre=cfg.proposals.n_test_pre_nms,
            n_post=cfg.proposals.n_test_post_nms,
            nms_thresh=cfg.proposals.nms_thresh,
            min_size=cfg.proposals.min_size,
            n_levels=n_levels,
        )
        r = props.rois.shape[1]
        rois = props.rois.reshape(b * r, 4)
        levels = props.levels.reshape(b * r)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)

        roi_cls_locs, roi_scores = model.apply(
            variables, features, rois, batch_idx, levels,
            method=MaskRCNN.head_box,
        )
        probs = jax.nn.softmax(roi_scores, axis=-1)  # (B·R, n_class)
        per_class_loc = roi_cls_locs.shape[-1] != 4

        def decode_image(rois_i, locs_i, probs_i, rvalid_i, hw_i):
            # rois_i (R,4); locs_i (R, 4) or (R, n_class*4); probs_i (R, C+1)
            if per_class_loc:
                locs_pc = locs_i.reshape(r, -1, 4) * std + mean  # (R, C+1, 4)
                boxes_pc = jax.vmap(
                    lambda roi_row, loc_row: loc2bbox(
                        jnp.broadcast_to(roi_row, loc_row.shape), loc_row
                    )
                )(rois_i, locs_pc)  # (R, C+1, 4)
                cls_boxes = boxes_pc[:, 1:, :].transpose(1, 0, 2)  # (n_fg,R,4)
            else:
                locs_u = locs_i * std + mean
                boxes = loc2bbox(rois_i, locs_u)  # (R, 4)
                cls_boxes = jnp.broadcast_to(boxes[None], (n_fg, r, 4))
            cls_boxes = clip_boxes(
                cls_boxes.reshape(n_fg * r, 4), (hw_i[0], hw_i[1])
            ).reshape(n_fg, r, 4)
            cls_scores = probs_i[:, 1:].T  # (n_fg, R)
            cls_valid = (
                rvalid_i[None, :] & (cls_scores > cfg.eval.score_thresh)
            )
            return cls_boxes, cls_scores, cls_valid

        cls_boxes, cls_scores, cls_valid = jax.vmap(decode_image)(
            props.rois,
            roi_cls_locs.reshape(b, r, -1),
            probs.reshape(b, r, -1),
            props.valid,
            img_hw,
        )
        return features, props.levels, cls_boxes, cls_scores, cls_valid

    def nms_body(cls_boxes, cls_scores, cls_valid):
        """Exact per-class greedy NMS (reference ``_suppress`` loops classes
        on host, maskrcnn.py:278-312): classes vmapped, batch SEQUENTIAL
        (lax.map) — see module docstring for the memory rationale."""
        per_image = jax.vmap(
            lambda bx, sc, va: nms_padded(
                bx, sc, cfg.eval.nms_thresh, n_keep_pc, va
            )
        )
        return jax.lax.map(
            lambda t: per_image(*t), (cls_boxes, cls_scores, cls_valid)
        )  # (B, n_fg, K) each

    def merge_body_onehot(cls_boxes, cls_scores, roi_levels, keep_idx,
                          keep_valid):
        """Global top-d merge across classes, GATHER-FREE: every index
        lookup is a one-hot contraction on the MXU (this environment's
        libtpu faults when several gather lowerings land in one
        executable; one-hots sidestep the gather emitter and are
        trivially cheap at this size)."""

        def per_image(cls_boxes_i, cls_scores_i, roi_levels_i, keep_idx_i,
                      keep_valid_i):
            onehot_k = (
                keep_idx_i[:, :, None] == jnp.arange(r_test)[None, None, :]
            )  # (n_fg, K, R)
            kept_scores = jnp.sum(
                jnp.where(onehot_k, cls_scores_i[:, None, :], 0.0), axis=-1
            )
            kept_scores = jnp.where(
                keep_valid_i, kept_scores, -jnp.inf
            ).reshape(n_fg * n_keep_pc)

            # global top-d by score across all classes (pad when the pool
            # is smaller than d so top_k always has enough slots)
            if n_fg * n_keep_pc < d:
                kept_scores = jnp.pad(
                    kept_scores, (0, d - n_fg * n_keep_pc),
                    constant_values=-jnp.inf,
                )
            top_scores, top_i = jax.lax.top_k(kept_scores, d)
            det_valid = jnp.isfinite(top_scores)
            safe_i = jnp.where(det_valid, top_i, 0)
            label = safe_i // n_keep_pc  # (d,) class of each winner
            # winner's ROI index: one-hot over the flattened kept table
            onehot_w = (
                safe_i[:, None] == jnp.arange(n_fg * n_keep_pc)[None, :]
            )  # (d, n_fg·K)
            roi_idx = jnp.sum(
                jnp.where(onehot_w, keep_idx_i.reshape(-1)[None, :], 0),
                axis=-1,
            )  # (d,)
            # winner's box: one-hot over the (n_fg·R) flattened box table
            flat_pos = label * r_test + roi_idx  # (d,)
            onehot_b = (
                flat_pos[:, None] == jnp.arange(n_fg * r_test)[None, :]
            ).astype(cls_boxes_i.dtype)  # (d, n_fg·R)
            det_boxes = onehot_b @ cls_boxes_i.reshape(n_fg * r_test, 4)
            # winner's pass-1 ROI level: one-hot over the R ROI slots
            onehot_r = (
                roi_idx[:, None] == jnp.arange(r_test)[None, :]
            )  # (d, R)
            det_levels = jnp.sum(
                jnp.where(onehot_r, roi_levels_i[None, :], 0), axis=-1
            ).astype(jnp.int32)
            det_scores = jnp.where(det_valid, top_scores, 0.0)
            det_labels = jnp.where(det_valid, label.astype(jnp.int32), 0)
            return det_boxes, det_scores, det_labels, det_valid, det_levels

        return jax.vmap(per_image)(cls_boxes, cls_scores, roi_levels,
                                   keep_idx, keep_valid)

    def merge_body_native(cls_boxes, cls_scores, roi_levels, keep_idx,
                          keep_valid):
        """Same merge with native gathers — the idiomatic XLA form for a
        healthy platform."""

        def per_image(cls_boxes_i, cls_scores_i, roi_levels_i, keep_idx_i,
                      keep_valid_i):
            kept_scores = jnp.take_along_axis(
                cls_scores_i, keep_idx_i, axis=1
            )  # (n_fg, K)
            kept_scores = jnp.where(
                keep_valid_i, kept_scores, -jnp.inf
            ).reshape(n_fg * n_keep_pc)
            if n_fg * n_keep_pc < d:
                kept_scores = jnp.pad(
                    kept_scores, (0, d - n_fg * n_keep_pc),
                    constant_values=-jnp.inf,
                )
            top_scores, top_i = jax.lax.top_k(kept_scores, d)
            det_valid = jnp.isfinite(top_scores)
            safe_i = jnp.where(det_valid, top_i, 0)
            label = safe_i // n_keep_pc
            roi_idx = keep_idx_i.reshape(-1)[safe_i]  # (d,)
            det_boxes = cls_boxes_i[label, roi_idx]  # (d, 4)
            det_levels = roi_levels_i[roi_idx].astype(jnp.int32)
            det_scores = jnp.where(det_valid, top_scores, 0.0)
            det_labels = jnp.where(det_valid, label.astype(jnp.int32), 0)
            return det_boxes, det_scores, det_labels, det_valid, det_levels

        return jax.vmap(per_image)(cls_boxes, cls_scores, roi_levels,
                                   keep_idx, keep_valid)

    def mask_body(variables, features, det_boxes, det_labels, det_levels):
        """Pass 2: masks/heatmaps on refined boxes (reference :215-229)."""
        b = det_boxes.shape[0]
        flat_boxes = det_boxes.reshape(b * d, 4)
        if pass1_levels:
            # reference behavior: pool at the level of the pass-1 ROI that
            # produced the detection (maskrcnn.py:215-229)
            flat_levels = det_levels.reshape(b * d)
        else:
            flat_levels = map_rois_to_fpn_levels(flat_boxes, 0, n_levels - 1)
        flat_bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        class_idx = None if is_keypoint else det_labels.reshape(b * d)
        mask_logits = model.apply(
            variables, features, flat_boxes, flat_bi, flat_levels, class_idx,
            method=MaskRCNN.head_mask,
        )
        if is_keypoint:
            s = mask_logits.shape[1]
            return None, mask_logits.reshape(b, d, s, s, -1)
        if mask_logits.ndim == 3:  # class-gathered (FPN mask head)
            sel = mask_logits
        else:  # heads without the gathered path (light/res5): select channel
            ch = jnp.clip(det_labels.reshape(b * d), 0,
                          mask_logits.shape[-1] - 1)
            sel = jnp.take_along_axis(
                mask_logits, ch[:, None, None, None], axis=-1
            )[..., 0]
        s = sel.shape[-1]
        return jax.nn.sigmoid(sel).reshape(b, d, s, s), None

    # ---------------- path assembly --------------------------------------

    if healthy:
        @jax.jit
        def predict_jit(variables, images, img_hw, scale):
            features, roi_levels, cls_boxes, cls_scores, cls_valid = (
                decode_body(variables, images, img_hw, scale)
            )
            keep_idx, keep_valid = nms_body(cls_boxes, cls_scores, cls_valid)
            det_boxes, det_scores, det_labels, det_valid, det_levels = (
                merge_body_native(cls_boxes, cls_scores, roi_levels,
                                  keep_idx, keep_valid)
            )
            masks, heat = mask_body(variables, features, det_boxes,
                                    det_labels, det_levels)
            return Detections(det_boxes, det_scores, det_labels, det_valid,
                              masks, heat)

        return predict_jit

    stage_decode = jax.jit(decode_body)
    stage_nms = jax.jit(nms_body)
    stage_merge = jax.jit(merge_body_onehot)
    stage_mask = jax.jit(mask_body)

    sync = os.environ.get("MASKRCNN_SYNC_PREDICT") == "1"

    def predict(variables, images, img_hw, scale):
        out = stage_decode(variables, images, img_hw, scale)
        if sync:
            jax.block_until_ready(out)
        features, roi_levels, cls_boxes, cls_scores, cls_valid = out
        keep = stage_nms(cls_boxes, cls_scores, cls_valid)
        if sync:
            jax.block_until_ready(keep)
        det = stage_merge(cls_boxes, cls_scores, roi_levels, *keep)
        if sync:
            jax.block_until_ready(det)
        det_boxes, det_scores, det_labels, det_valid, det_levels = det
        masks, heat = stage_mask(variables, features, det_boxes, det_labels,
                                 det_levels)
        return Detections(det_boxes, det_scores, det_labels, det_valid,
                          masks, heat)

    return predict
