"""On-device AnchorTargetCreator — RPN training targets.

Spec: chainercv ``AnchorTargetCreator`` as used by the reference train chain
(reference chainer_maskrcnn/model/fpn_maskrcnn_train_chain.py:81-85, applied
to the concatenation of all pyramid levels' anchors at once; hyperparams in
SURVEY §2c): 256 sampled anchors per image, pos_iou ≥ 0.7 (plus the
highest-IoU anchor per GT), neg < 0.3, pos_ratio 0.5, anchors not fully
inside the image ignored (label −1).

TPU-native: fixed shapes (labels over ALL anchors with −1 ignore — the
"sampling" is a random disable of surplus anchors, which is exactly
chainercv's `_unmap`-free inner behavior), stateless PRNG, vmapped over
batch. The reference runs this on host CPU per image per step; here it's
fused into the jitted train step.

Random subsampling uses the random-priority trick: surplus positives
(negatives) to disable are chosen by ranking uniform random priorities —
equivalent in distribution to ``np.random.choice(replace=False)``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from maskrcnn_tpu.ops import bbox2loc, box_iou


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray  # (B, A) int32: 1 pos, 0 neg, -1 ignore
    locs: jnp.ndarray  # (B, A, 4) float32 bbox2loc targets (pos rows valid)


def _keep_top_random(mask: jnp.ndarray, key: jax.Array, k: jnp.ndarray | int,
                     k_max: int) -> jnp.ndarray:
    """Keep a uniformly random subset of at most ``k`` True entries.

    Random-priority top-k by THRESHOLD: one ``lax.top_k(k_max)`` instead of a
    full argsort over all anchors (the sort was 15 ms/step at 205k anchors).
    ``k`` may be traced (≤ k_max); ``k_max`` is static.
    """
    k_max = min(k_max, mask.shape[-1])  # tiny configs: fewer anchors than k
    pri = jnp.where(mask, jax.random.uniform(key, mask.shape), -1.0)
    if jax.default_backend() == "tpu" and k_max < mask.shape[-1]:
        # selecting a RANDOM subset: approximate top-k of random priorities
        # is still a uniform random subset — skip the exact 205k-element sort
        top_vals, _ = jax.lax.approx_max_k(pri, k_max)
        top_vals = jnp.sort(top_vals)[::-1]
    else:
        top_vals, _ = jax.lax.top_k(pri, k_max)
    kth = top_vals[jnp.clip(k - 1, 0, k_max - 1)]
    keep = mask & (pri >= kth)
    return jnp.where(k > 0, keep, jnp.zeros_like(keep))


@functools.partial(jax.jit, static_argnames=("n_sample", "pos_ratio"))
def anchor_targets(
    key: jax.Array,
    anchors: jnp.ndarray,  # (A, 4) static per compile
    gt_boxes: jnp.ndarray,  # (B, G, 4) padded
    gt_valid: jnp.ndarray,  # (B, G) bool
    img_hw: jnp.ndarray,  # (B, 2) true content extent
    n_sample: int = 256,
    pos_iou_thresh: float = 0.7,
    neg_iou_thresh: float = 0.3,
    pos_ratio: float = 0.5,
) -> AnchorTargets:
    b = gt_boxes.shape[0]
    # single key → split per image; (B,) key batch → use as-is (see
    # proposal_targets — keeps grad-accum sampling split-invariant).
    keys = key if key.ndim == 1 else jax.random.split(key, b)

    def per_image(k, gt_i, gt_valid_i, hw_i):
        inside = (
            (anchors[:, 0] >= 0)
            & (anchors[:, 1] >= 0)
            & (anchors[:, 2] <= hw_i[0])
            & (anchors[:, 3] <= hw_i[1])
        )  # (A,)

        iou = box_iou(anchors, gt_i)  # (A, G)
        iou = jnp.where(gt_valid_i[None, :], iou, -1.0)
        any_gt = gt_valid_i.any()

        argmax_gt = jnp.argmax(iou, axis=1)  # (A,)
        max_iou = jnp.max(iou, axis=1)
        max_iou = jnp.where(any_gt, max_iou, 0.0)

        # chainercv: anchors achieving the per-GT max IoU are positive
        # (ties included), plus the >= pos_iou_thresh ones.
        gt_max = jnp.max(jnp.where(inside[:, None], iou, -1.0), axis=0)  # (G,)
        is_gt_argmax = (
            (iou >= gt_max[None, :] - 1e-7) & gt_valid_i[None, :] & (gt_max[None, :] > 0)
        ).any(axis=1)

        label = jnp.full(anchors.shape[0], -1, jnp.int32)
        label = jnp.where(inside & (max_iou < neg_iou_thresh), 0, label)
        label = jnp.where(inside & (is_gt_argmax | (max_iou >= pos_iou_thresh)), 1, label)

        # Subsample positives to n_sample*pos_ratio.
        k1, k2 = jax.random.split(k)
        n_pos_cap = int(n_sample * pos_ratio)
        pos = label == 1
        pos_keep = _keep_top_random(pos, k1, n_pos_cap, n_pos_cap)
        label = jnp.where(pos & ~pos_keep, -1, label)

        # Subsample negatives to n_sample - kept positives.
        n_pos = (label == 1).sum()
        neg = label == 0
        neg_keep = _keep_top_random(neg, k2, n_sample - n_pos, n_sample)
        label = jnp.where(neg & ~neg_keep, -1, label)

        # gt_i[argmax_gt] as a ONE-HOT CONTRACTION on the MXU. Profiled
        # alternatives at 205k anchors × G=64 on v5e: a single (A, 4) row
        # gather = 7.3 ms/step; round 2's four columnar (A,)-from-(G,)
        # gathers = 38.8 ms/step across fwd+vjp (tiny-operand gathers lower
        # at 2-3 GiB/s). The (A, G) @ (G, 4) matmul is ~0.1 GFLOP — noise
        # on the MXU. f32: box coords up to ~1024 don't survive bf16.
        onehot = (
            argmax_gt[:, None] == jnp.arange(gt_i.shape[0])[None, :]
        ).astype(jnp.float32)  # (A, G)
        gt_sel = onehot @ gt_i  # (A, 4)
        locs = bbox2loc(anchors, gt_sel)
        return label, locs

    labels, locs = jax.vmap(per_image)(keys, gt_boxes, gt_valid, img_hw)
    return AnchorTargets(labels, locs)
