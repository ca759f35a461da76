"""Two-pass inference: boxes first, then masks on refined boxes — one jit.

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

    # ------------------------------------------------------------------
    # The pipeline is THREE jitted executables, not one. Functionally a
    # single jit is correct (and is how round 1 shipped), but this
    # environment's libtpu faults — "TPU worker process crashed" — when the
    # vmapped per-class NMS block is compiled into the same executable as
    # the backbone/decode graph (reproduced consistently on trained
    # weights; each stage below runs clean standalone on the same inputs).
    # The split costs two extra dispatches on ~4 MB of device-resident
    # intermediates and nothing else; no fusion opportunity is lost across
    # these boundaries.
    # ------------------------------------------------------------------

    @jax.jit
    def stage_decode(variables, images, img_hw, scale):
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
        return features, cls_boxes, cls_scores, cls_valid

    @jax.jit
    def stage_nms(cls_boxes, cls_scores, cls_valid):
        """Exact per-class greedy NMS (reference ``_suppress`` loops classes
        on host, maskrcnn.py:278-312): classes vmapped, batch SEQUENTIAL
        (lax.map). A batch-vmapped form materializes (B, n_fg, R, R) IoU +
        suppression tensors — 4.5 GB at B=8/n_fg=79/R=300 — which crashes
        this environment's TPU worker; per-image the peak is B× smaller and
        the extra latency is negligible at eval time."""
        per_image = jax.vmap(
            lambda bx, sc, va: nms_padded(
                bx, sc, cfg.eval.nms_thresh, n_keep_pc, va
            )
        )
        return jax.lax.map(
            lambda t: per_image(*t), (cls_boxes, cls_scores, cls_valid)
        )  # (B, n_fg, K) each

    @jax.jit
    def stage_merge(cls_boxes, cls_scores, keep_idx, keep_valid):
        """Global top-d merge across classes. Indices ride through the
        top-k; only the final d winners' boxes are gathered (cheaper than
        gathering all n_fg·K kept boxes, and avoids fusing a second
        take_along_axis with the first — a combination this environment's
        libtpu miscompiles)."""

        def per_image(cls_boxes_i, cls_scores_i, keep_idx_i, keep_valid_i):
            # GATHER-FREE: every index lookup is a one-hot contraction on
            # the MXU. Gather lowerings in this environment's libtpu fault
            # when several land in one executable (minimal repro: two
            # take_along_axis fused → worker crash); one-hots sidestep the
            # gather emitter entirely and are trivially cheap at this size.
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
            slot = safe_i % n_keep_pc
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
            det_scores = jnp.where(det_valid, top_scores, 0.0)
            det_labels = jnp.where(det_valid, label.astype(jnp.int32), 0)
            return det_boxes, det_scores, det_labels, det_valid

        return jax.vmap(per_image)(cls_boxes, cls_scores, keep_idx,
                                   keep_valid)

    @jax.jit
    def stage_mask(variables, features, det_boxes, det_labels):
        """Pass 2: masks/heatmaps on refined boxes (reference :215-229)."""
        b = det_boxes.shape[0]
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

    import os

    sync = os.environ.get("MASKRCNN_SYNC_PREDICT") == "1"

    def predict(variables, images, img_hw, scale):
        out = stage_decode(variables, images, img_hw, scale)
        if sync:
            jax.block_until_ready(out)
        features, cls_boxes, cls_scores, cls_valid = out
        keep = stage_nms(cls_boxes, cls_scores, cls_valid)
        if sync:
            jax.block_until_ready(keep)
        det = stage_merge(cls_boxes, cls_scores, *keep)
        if sync:
            jax.block_until_ready(det)
        det_boxes, det_scores, det_labels, det_valid = det
        masks, heat = stage_mask(variables, features, det_boxes, det_labels)
        return Detections(det_boxes, det_scores, det_labels, det_valid,
                          masks, heat)

    return predict
