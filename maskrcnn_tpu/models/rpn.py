"""Multilevel RPN: one shared head over all pyramid levels + fixed-shape
on-device proposal generation.

Spec: reference ``MultilevelRegionProposalNetwork``
(chainer_maskrcnn/model/rpn/multilevel_region_proposal_network.py:34-166):
- a single 3×3 conv (+relu) shared across levels, then 1×1 score (2A) and
  1×1 loc (4A) heads (:80-88,126-146),
- anchors enumerated per level, concatenated fine→coarse (:128-129,149-152),
- ONE proposal-creation pass per image over all levels jointly (:154-161),
- per-ROI FPN head levels via ``map_rois_to_fpn_levels`` (:164).

TPU-native differences: proposal decode → clip → min-size filter → top-k →
NMS all run on device with static shapes (the reference's chainercv
ProposalCreator does host round-trips); the whole thing vmaps over batch
(the reference is batch-1 only).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.ops import (
    clip_boxes,
    loc2bbox,
    map_rois_to_fpn_levels,
    multilevel_anchors,
    nms_padded,
)


class RPNHead(nn.Module):
    """Shared conv head applied to every pyramid level."""

    mid_channels: int = 256
    n_anchor: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: list[jnp.ndarray]):
        """Returns (locs (B, ΣHWA, 4), scores (B, ΣHWA, 2)) in float32.

        Enumeration order matches :func:`maskrcnn_tpu.ops.shifted_anchors`:
        row-major grid position, anchor index innermost — so row i of the
        outputs corresponds to row i of the concatenated anchors.
        """
        conv = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")
        score = nn.Conv(self.n_anchor * 2, (1, 1), dtype=self.dtype, name="score")
        loc = nn.Conv(self.n_anchor * 4, (1, 1), dtype=self.dtype, name="loc")

        locs, scores = [], []
        for f in features:
            b = f.shape[0]
            h = nn.relu(conv(f))
            l = loc(h).astype(jnp.float32).reshape(b, -1, 4)
            s = score(h).astype(jnp.float32).reshape(b, -1, 2)
            locs.append(l)
            scores.append(s)
        return jnp.concatenate(locs, axis=1), jnp.concatenate(scores, axis=1)


class Proposals(NamedTuple):
    rois: jnp.ndarray  # (B, R, 4) yxyx image coords
    levels: jnp.ndarray  # (B, R) int32 FPN head level
    valid: jnp.ndarray  # (B, R) bool
    scores: jnp.ndarray  # (B, R) objectness


def anchors_for(cfg: Config, feat_shapes: list[tuple[int, int]],
                feat_strides: tuple[int, ...]) -> np.ndarray:
    """Static concatenated anchors (A_total, 4) for bucketed image size."""
    per_level = multilevel_anchors(
        feat_shapes,
        list(feat_strides),
        list(cfg.anchors.scales[: len(feat_shapes)]),
        cfg.anchors.base_size,
        cfg.anchors.ratios,
    )
    return np.concatenate(per_level, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("n_pre", "n_post", "nms_thresh", "min_size", "n_levels"),
)
def generate_proposals(
    locs: jnp.ndarray,  # (B, A, 4)
    scores: jnp.ndarray,  # (B, A, 2) — softmax over last dim, fg = idx 1
    anchors: jnp.ndarray,  # (A, 4)
    scale: jnp.ndarray,  # (B,) image resize scale
    img_hw: jnp.ndarray,  # (B, 2) true content size inside the padded canvas
    n_pre: int,
    n_post: int,
    nms_thresh: float = 0.7,
    min_size: float = 16.0,
    n_levels: int = 5,
) -> Proposals:
    """Decode + filter + NMS → fixed (B, n_post) proposal slots.

    Pipeline per image (spec: reference utils/proposal_creator.py:108-169):
    loc2bbox → clip to image → drop boxes with a side < min_size·scale →
    top-``n_pre`` by fg score → NMS(thresh) → top-``n_post`` slots + mask.

    ``img_hw`` is per-image and traced: images live in a static padded bucket
    but proposals clip to the true (resized) content extent, matching the
    reference's dynamic-size clipping without recompilation.
    """
    fg = jax.nn.softmax(scores, axis=-1)[..., 1]  # (B, A)

    def per_image(loc_i, fg_i, scale_i, hw_i):
        boxes = clip_boxes(loc2bbox(anchors, loc_i), (hw_i[0], hw_i[1]))
        hs = boxes[:, 2] - boxes[:, 0]
        ws = boxes[:, 3] - boxes[:, 1]
        ms = min_size * scale_i
        ok = (hs >= ms) & (ws >= ms)
        masked = jnp.where(ok, fg_i, -jnp.inf)

        k = min(n_pre, boxes.shape[0])
        if k < boxes.shape[0] and jax.default_backend() == "tpu":
            # Pre-NMS candidate selection doesn't need exact order —
            # approx_max_k is a single-pass TPU kernel (recall ≥ 0.99 vs a
            # full 205k-element sort; measured recall 1.0 at these shapes).
            top_scores, top_idx = jax.lax.approx_max_k(
                masked, k, recall_target=0.99
            )
        else:
            top_scores, top_idx = jax.lax.top_k(masked, k)
        top_boxes = boxes[top_idx]
        tvalid = jnp.isfinite(top_scores)

        idx, valid = nms_padded(top_boxes, top_scores, nms_thresh, n_post, tvalid)
        rois = top_boxes[idx]
        roi_scores = jnp.where(valid, top_scores[idx], 0.0)
        levels = jnp.where(
            valid, map_rois_to_fpn_levels(rois, 0, n_levels - 1), 0
        )
        return rois, levels, valid, roi_scores

    rois, levels, valid, roi_scores = jax.vmap(per_image)(
        locs, fg, scale, img_hw
    )
    return Proposals(rois, levels, valid, roi_scores)
