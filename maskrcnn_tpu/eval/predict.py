"""Two-pass inference: boxes first, then masks on refined boxes — one jit.

Spec: reference ``MaskRCNN.predict`` (chainer_maskrcnn/model/maskrcnn.py:157-259):
pass 1 runs backbone+RPN+box branch, boxes are decoded
(loc · std + mean → loc2bbox → clip, :189-203), per-class score-threshold +
NMS 0.3 (``_suppress``, :278-312, on HOST in the reference), then pass 2
pools the REFINED boxes for the mask branch (:215-229).

TPU-native differences:
- everything incl. the per-class NMS runs on device with static shapes:
  detections live in ``max_detections`` padded slots,
- per-class NMS uses the class-offset trick over the top-K candidates
  instead of a Python loop over classes,
- the reference's off-by-one quirk of skipping the LAST fg class during
  mask prediction (:287-291, a workaround kept in its code) is fixed here —
  every fg class is eligible (SURVEY §7 hard-part 7 policy: fix bugs).

Host-side mask pasting / keypoint decoding live in ``postprocess.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.models import MaskRCNN, anchors_for, generate_proposals
from maskrcnn_tpu.models.maskrcnn import backbone_geometry, pyramid_shapes
from maskrcnn_tpu.ops import (
    batched_nms_padded,
    clip_boxes,
    loc2bbox,
    map_rois_to_fpn_levels,
)


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, D, 4) yxyx in network-input coords
    scores: jnp.ndarray  # (B, D)
    labels: jnp.ndarray  # (B, D) int32, 0-based fg class
    valid: jnp.ndarray  # (B, D) bool
    masks: jnp.ndarray | None  # (B, D, S, S) sigmoid probs (mask heads)
    heatmaps: jnp.ndarray | None  # (B, D, S, S, K) logits (keypoint head)


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
    # candidate pool entering the class-aware NMS (see module docstring)
    n_cand = min(1000, cfg.proposals.n_test_post_nms * n_fg)

    @jax.jit
    def predict(variables, images, img_hw, scale):
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
                cand_boxes = boxes_pc[:, 1:, :].reshape(r * n_fg, 4)
            else:
                locs_u = locs_i * std + mean
                boxes = loc2bbox(rois_i, locs_u)  # (R, 4)
                cand_boxes = jnp.broadcast_to(
                    boxes[:, None, :], (r, n_fg, 4)
                ).reshape(r * n_fg, 4)
            cand_boxes = clip_boxes(cand_boxes, (hw_i[0], hw_i[1]))
            cand_scores = probs_i[:, 1:].reshape(r * n_fg)
            cand_labels = jnp.broadcast_to(
                jnp.arange(n_fg, dtype=jnp.int32)[None, :], (r, n_fg)
            ).reshape(r * n_fg)
            cand_valid = (
                jnp.repeat(rvalid_i, n_fg)
                & (cand_scores > cfg.eval.score_thresh)
            )

            # top-K pool, then one class-aware NMS (reference _suppress).
            masked = jnp.where(cand_valid, cand_scores, -jnp.inf)
            top_scores, top_idx = jax.lax.top_k(masked, n_cand)
            keep_idx, keep_valid = batched_nms_padded(
                cand_boxes[top_idx],
                top_scores,
                cand_labels[top_idx],
                cfg.eval.nms_thresh,
                d,
                jnp.isfinite(top_scores),
                coord_bound=float(max(h, w) * 4),
            )
            sel = top_idx[keep_idx]
            det_boxes = cand_boxes[sel]
            det_scores = jnp.where(keep_valid, cand_scores[sel], 0.0)
            det_labels = jnp.where(keep_valid, cand_labels[sel], 0)
            return det_boxes, det_scores, det_labels, keep_valid

        det = jax.vmap(decode_image)(
            props.rois,
            roi_cls_locs.reshape(b, r, -1),
            probs.reshape(b, r, -1),
            props.valid,
            img_hw,
        )
        det_boxes, det_scores, det_labels, det_valid = det

        # ---- pass 2: masks/heatmaps on refined boxes (reference :215-229) --
        flat_boxes = det_boxes.reshape(b * d, 4)
        flat_levels = map_rois_to_fpn_levels(flat_boxes, 0, n_levels - 1)
        flat_bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        class_idx = None if is_keypoint else det_labels.reshape(b * d)
        mask_logits = model.apply(
            variables, features, flat_boxes, flat_bi, flat_levels, class_idx,
            method=MaskRCNN.head_mask,
        )

        if is_keypoint:
            s = mask_logits.shape[1]
            heat = mask_logits.reshape(b, d, s, s, -1)
            return Detections(det_boxes, det_scores, det_labels, det_valid,
                              None, heat)

        if mask_logits.ndim == 3:  # class-gathered (FPN mask head)
            sel = mask_logits
        else:  # heads without the gathered path (light/res5): select channel
            ch = jnp.clip(det_labels.reshape(b * d), 0,
                          mask_logits.shape[-1] - 1)
            sel = jnp.take_along_axis(
                mask_logits, ch[:, None, None, None], axis=-1
            )[..., 0]
        s = sel.shape[-1]
        masks = jax.nn.sigmoid(sel).reshape(b, d, s, s)
        return Detections(det_boxes, det_scores, det_labels, det_valid,
                          masks, None)

    return predict
