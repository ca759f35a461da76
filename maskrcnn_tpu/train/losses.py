"""The 5-term Mask R-CNN loss, fixed-shape with validity masks.

Spec: reference ``FPNMaskRCNNTrainChain``
(chainer_maskrcnn/model/fpn_maskrcnn_train_chain.py:30-117) plus the injected
mask-loss functions (train.py:50-58 sigmoid CE on the GT class's mask channel;
train_keypoints.py:21-27 softmax CE over S² bins with −1 ignore), and
chainercv's ``_fast_rcnn_loc_loss`` / ``_smooth_l1_loss`` (SURVEY §2c):
smooth-L1 on positive rows only, normalized by #(label ≥ 0); σ=3 for RPN,
σ=1 for the head.

Ignored entries are encoded as label −1 (chainer's softmax_cross_entropy
ignore_label convention); padded slots are mapped to −1 before the loss.

Axis-aware normalization: every loss here is a ratio ``numerator_sum /
valid_count``. Under shard_map data parallelism each device sees only its
local shard; averaging per-shard ratios (mean-of-ratios) does NOT equal the
global-batch ratio when shards have uneven valid counts. Passing
``axis_name`` makes the DENOMINATOR global (``lax.psum`` of the local
count) while the numerator stays local — then ``psum`` of the per-shard
loss values/gradients reproduces the single-device global-batch loss and
gradient exactly (train/step.py reduces with psum in that mode).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def smooth_l1(x: jnp.ndarray, t: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Elementwise smooth-L1 (chainercv _smooth_l1_loss, no reduction)."""
    sigma2 = sigma**2
    diff = x - t
    abs_diff = jnp.abs(diff)
    return jnp.where(
        abs_diff < 1.0 / sigma2,
        0.5 * diff * diff * sigma2,
        abs_diff - 0.5 / sigma2,
    )


def _global_count(count: jnp.ndarray, axis_name: str | None) -> jnp.ndarray:
    """Valid-count denominator, summed over the DP axis when inside
    shard_map (see module docstring)."""
    count = count.astype(jnp.float32)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
    return jnp.maximum(count, 1.0)


def fast_rcnn_loc_loss(
    pred_loc: jnp.ndarray,  # (N, 4)
    gt_loc: jnp.ndarray,  # (N, 4)
    labels: jnp.ndarray,  # (N,) int32: >0 pos, 0 neg, -1 ignore
    sigma: float,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Smooth-L1 summed over positive rows / #(label ≥ 0)."""
    pos = (labels > 0).astype(jnp.float32)[:, None]
    loss = (smooth_l1(pred_loc, gt_loc, sigma) * pos).sum()
    return loss / _global_count((labels >= 0).sum(), axis_name)


def softmax_ce_ignore(
    logits: jnp.ndarray,  # (N, C)
    labels: jnp.ndarray,  # (N,) int32, -1 = ignore
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Mean softmax cross-entropy over non-ignored rows (chainer semantics).

    The label pick is a one-hot contraction, NOT take_along_axis: a row
    gather on a (B·A, 2) array lowers to a laneshuffling custom fusion that
    alone cost 16.6 ms/step at 800×1024 b8 (9% of the step, profiled on
    v5e); the one-hot multiply-sum fuses into the log_softmax chain.
    """
    valid = labels >= 0
    safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = safe[:, None] == jnp.arange(logits.shape[-1])[None, :]
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / _global_count(valid.sum(), axis_name)


def sigmoid_mask_loss(
    mask_logits: jnp.ndarray,  # (N, S, S) pre-selected OR (N, S, S, n_fg)
    mask_targets: jnp.ndarray,  # (N, S, S) binary float
    labels: jnp.ndarray,  # (N,) int32, bg=0 convention
    is_pos: jnp.ndarray,  # (N,) bool — only positives contribute
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Per-class binary mask loss (reference train.py:50-58).

    Averages sigmoid CE of the GT class's channel over all pixels of
    positive samples (chainer sigmoid_cross_entropy normalize=True
    semantics). Accepts logits already gathered to the GT class (3-D, the
    class-gathered head path) or the full per-class stack (4-D).
    """
    if mask_logits.ndim == 3:
        sel = mask_logits
    else:
        ch = jnp.clip(labels - 1, 0, mask_logits.shape[-1] - 1)
        sel = jnp.take_along_axis(
            mask_logits, ch[:, None, None, None], axis=-1
        )[..., 0]  # (N, S, S)
    ce = jnp.maximum(sel, 0.0) - sel * mask_targets + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    w = is_pos.astype(jnp.float32)[:, None, None]
    denom = _global_count(w.sum(), axis_name) * ce.shape[1] * ce.shape[2]
    return (ce * w).sum() / denom


def keypoint_ce_loss(
    heat_logits: jnp.ndarray,  # (N, S, S, K)
    kp_labels: jnp.ndarray,  # (N, K) int32 bin in [0, S²) or -1
    is_pos: jnp.ndarray,  # (N,) bool
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Softmax CE over S² location bins per keypoint
    (reference train_keypoints.py:21-27), ignoring −1 and non-positives."""
    n, s, _, k = heat_logits.shape
    logits = heat_logits.reshape(n, s * s, k).transpose(0, 2, 1).reshape(n * k, s * s)
    labels = jnp.where(is_pos[:, None], kp_labels, -1).reshape(n * k)
    return softmax_ce_ignore(logits, labels, axis_name)


class LossBreakdown(NamedTuple):
    loss: jnp.ndarray
    rpn_loc_loss: jnp.ndarray
    rpn_cls_loss: jnp.ndarray
    roi_loc_loss: jnp.ndarray
    roi_cls_loss: jnp.ndarray
    mask_loss: jnp.ndarray


def select_roi_locs(
    roi_cls_locs: jnp.ndarray,  # (N, 4) or (N, n_class*4)
    labels: jnp.ndarray,  # (N,)
) -> jnp.ndarray:
    """Class-agnostic heads pass through; per-class heads (res5) gather the
    GT class's 4-vector (reference fpn_maskrcnn_train_chain.py:95-98)."""
    if roi_cls_locs.shape[-1] == 4:
        return roi_cls_locs
    n = roi_cls_locs.shape[0]
    per_class = roi_cls_locs.reshape(n, -1, 4)
    safe = jnp.clip(labels, 0, per_class.shape[1] - 1)
    return jnp.take_along_axis(per_class, safe[:, None, None], axis=1)[:, 0]
