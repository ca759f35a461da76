"""The single jitted train step — the whole reference iteration on device.

Replaces the reference's per-step host choreography (SURVEY §3.1: cv2
transforms → GPU forward → CPU ProposalTargetCreator → GPU head → backward
with 512 per-ROI kernel launches) with ONE ``jax.jit`` graph:

    backbone → RPN → proposals (NMS on device) → anchor+proposal targets
    (stateless PRNG) → batched ROIAlign head → 5-term loss → grad → SGD.

Batch size is free (the reference asserts batch==1,
fpn_maskrcnn_train_chain.py:38-40). Data parallelism: the same step runs
under ``jax.jit`` with sharded batch inputs over a Mesh — see
``maskrcnn_tpu/parallel``.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.models import MaskRCNN, anchors_for, generate_proposals
from maskrcnn_tpu.models.maskrcnn import backbone_geometry, pyramid_shapes
from maskrcnn_tpu.targets import (
    anchor_targets,
    keypoint_targets,
    mask_targets,
    proposal_targets,
)
from maskrcnn_tpu.train import losses as L
from maskrcnn_tpu.train.state import TrainState, make_optimizer


class Batch(NamedTuple):
    """One fixed-shape device batch. Padded everywhere; masks carry truth."""

    images: jnp.ndarray  # (B, H, W, 3) float32 in [0,1] or uint8 in
    #   [0,255] (MaskRCNN.extract normalizes uint8 on device — the COCO
    #   loader ships uint8 for ¼ the host work/transfer)
    img_hw: jnp.ndarray  # (B, 2) float32 true content extent
    scale: jnp.ndarray  # (B,) resize scale (for the min-size filter)
    gt_boxes: jnp.ndarray  # (B, G, 4)
    gt_labels: jnp.ndarray  # (B, G) int32 0-based fg class
    gt_valid: jnp.ndarray  # (B, G) bool
    gt_masks: jnp.ndarray | None = None  # (B, G, S, S) float box-crops
    gt_keypoints: jnp.ndarray | None = None  # (B, G, K, 3) (y, x, v)


def _flatten_rois(sample_rois, sample_levels):
    """(B, n, ·) ROI slots → flat (B·n, ·) + batch indices for pooling."""
    b, n, _ = sample_rois.shape
    rois = sample_rois.reshape(b * n, 4)
    levels = sample_levels.reshape(b * n)
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    return rois, levels, batch_idx


def make_train_step(cfg: Config, model: MaskRCNN,
                    image_size: tuple[int, int] | None = None,
                    axis_name: str | None = None,
                    chain: int = 1):
    """Build the jitted train step for a config. Anchors are trace-time
    constants derived from the static image bucket; with multi-bucket
    input (``cfg.train.image_buckets``) build one step per bucket by
    passing ``image_size``.

    ``axis_name`` builds the per-device-LOCAL body for a shard_map DP step
    (parallel/mesh.py): the batch argument is the local shard, gradients and
    metrics are ``lax.pmean``-ed over the axis before the (replicated)
    optimizer update, and per-image sampling keys are derived from the
    GLOBAL image index (``axis_index * local_b + i``) so the sampled
    proposals/anchors are bit-identical to the single-device step on the
    same global batch. The function is returned UNJITTED in that mode (the
    caller wraps it in shard_map + jit). Losses normalize by GLOBAL valid
    counts (axis-aware denominators) and gradients reduce with psum, so at
    ``grad_accum_steps == 1`` the update matches the single-device
    global-batch step exactly (tests/test_parallel.py). With accumulation
    the micro-batch GROUPING differs (each shard splits its local rows),
    so the documented accum-vs-full divergence applies per shard.

    ``chain > 1`` returns a step over a STACK of ``chain`` batches (every
    array field carries a leading ``(chain, ...)`` axis): one dispatch
    runs ``chain`` optimizer steps via ``lax.scan`` and returns metrics
    stacked ``(chain,)`` per key. On a tunneled/remote device link the
    per-dispatch round trip dominates a per-step loop (measured ~0.85 s
    of the 1.2 s/step at 512²b8 on the axon relay); chaining amortizes it
    by K. Semantics are EXACTLY K sequential steps — same PRNG path, same
    batch order, same updates (it scans the identical step body).

    NOTE: the returned step donates its ``state`` argument (in-place param
    update, halves HBM traffic). Always rebind: ``state, metrics =
    step(state, batch)`` — reusing a donated state crashes with an opaque
    TPU InvalidArgument error."""
    feat_strides, _ = backbone_geometry(cfg)
    feat_shapes = pyramid_shapes(cfg, image_size or cfg.train.image_size)
    anchors = jnp.asarray(anchors_for(cfg, feat_shapes, feat_strides))
    n_levels = len(feat_shapes)
    is_keypoint = cfg.model.head == "fpn_keypoint"
    tx = make_optimizer(cfg)

    def loss_fn(params, batch_stats, batch: Batch, img_keys):
        # img_keys: (b, 2) per-image sampling keys, derived from the GLOBAL
        # image index in train_step — so the micro-batches of a grad-accum
        # scan draw the exact same proposal/anchor samples as the full
        # batch, and the only accum-vs-full divergence left is loss
        # normalization (bounded in tests/test_train.py).
        k_prop, k_anchor = img_keys[:, 0], img_keys[:, 1]
        variables = {"params": params, "batch_stats": batch_stats}

        (features, rpn_locs, rpn_scores), mut = model.apply(
            variables, batch.images, True, mutable=["batch_stats"]
        )

        # Proposals see no gradient (two-stage detectors decouple here,
        # as does the reference via its numpy ProposalCreator).
        props = generate_proposals(
            jax.lax.stop_gradient(rpn_locs),
            jax.lax.stop_gradient(rpn_scores),
            anchors,
            batch.scale,
            batch.img_hw,
            n_pre=cfg.proposals.n_train_pre_nms,
            n_post=cfg.proposals.n_train_post_nms,
            nms_thresh=cfg.proposals.nms_thresh,
            min_size=cfg.proposals.min_size,
            n_levels=n_levels,
        )

        sample = proposal_targets(
            k_prop,
            props.rois,
            props.valid,
            props.levels,
            batch.gt_boxes,
            batch.gt_labels,
            batch.gt_valid,
            n_sample=cfg.sampler.n_sample,
            pos_ratio=cfg.sampler.pos_ratio,
            pos_iou_thresh=cfg.sampler.pos_iou_thresh,
            neg_iou_thresh_hi=cfg.sampler.neg_iou_thresh_hi,
            neg_iou_thresh_lo=cfg.sampler.neg_iou_thresh_lo,
            loc_normalize_mean=cfg.sampler.loc_normalize_mean,
            loc_normalize_std=cfg.sampler.loc_normalize_std,
            n_levels=n_levels,
        )

        # Head: box branch on every slot + mask/keypoint branch only on the
        # positive slots (the sampler places positives FIRST, slots
        # [0, n_pos_cap), and only positives carry mask loss — 4× less mask
        # branch work than the reference, identical gradients). For FPN
        # heads both branches share ONE region gather (head_train).
        n_pos_cap = int(round(cfg.sampler.n_sample * cfg.sampler.pos_ratio))
        # class-gathered final conv (FPN mask head): compute only each
        # positive's GT-class mask channel.
        class_idx = (
            None if is_keypoint
            else (sample.labels[:, :n_pos_cap] - 1).reshape(-1)
        )
        (roi_cls_locs, roi_scores, roi_masks), mut2 = model.apply(
            {"params": params, "batch_stats": mut["batch_stats"]},
            features, sample.rois, sample.levels, n_pos_cap, class_idx,
            mutable=["batch_stats"],
            method=MaskRCNN.head_train,
        )

        at = anchor_targets(
            k_anchor, anchors, batch.gt_boxes, batch.gt_valid, batch.img_hw,
            n_sample=cfg.anchor_targets.n_sample,
            pos_iou_thresh=cfg.anchor_targets.pos_iou_thresh,
            neg_iou_thresh=cfg.anchor_targets.neg_iou_thresh,
            pos_ratio=cfg.anchor_targets.pos_ratio,
        )

        # ---- RPN losses (σ=3; fpn_maskrcnn_train_chain.py:83-85) ----
        a = anchors.shape[0]
        b = batch.images.shape[0]
        rpn_loc_loss = L.fast_rcnn_loc_loss(
            rpn_locs.reshape(b * a, 4),
            at.locs.reshape(b * a, 4),
            at.labels.reshape(b * a),
            sigma=3.0,
            axis_name=axis_name,
        )
        rpn_cls_loss = L.softmax_ce_ignore(
            rpn_scores.reshape(b * a, 2), at.labels.reshape(b * a),
            axis_name,
        )

        # ---- head losses (σ=1; :88-102) ----
        cls_labels = jnp.where(sample.valid, sample.labels, -1).reshape(-1)
        roi_loc = L.select_roi_locs(roi_cls_locs, cls_labels)
        roi_loc_loss = L.fast_rcnn_loc_loss(
            roi_loc, sample.locs.reshape(-1, 4), cls_labels, sigma=1.0,
            axis_name=axis_name,
        )
        roi_cls_loss = L.softmax_ce_ignore(roi_scores, cls_labels, axis_name)

        # ---- mask / keypoint loss (injected in reference; train.py:50-58) --
        # restricted to the positive slots pooled above
        sample_pos = type(sample)(*(x[:, :n_pos_cap] for x in sample))
        pos_flat = (sample_pos.is_pos & sample_pos.valid).reshape(-1)
        if is_keypoint:
            kp_t = keypoint_targets(
                sample_pos, batch.gt_keypoints, mask_size=cfg.model.mask_size
            )
            mask_loss = L.keypoint_ce_loss(
                roi_masks, kp_t.reshape(-1, kp_t.shape[-1]), pos_flat,
                axis_name,
            )
        else:
            m_t = mask_targets(
                sample_pos, batch.gt_masks, batch.gt_boxes,
                mask_size=cfg.model.mask_size,
            )
            s = cfg.model.mask_size
            mask_loss = L.sigmoid_mask_loss(
                roi_masks, m_t.reshape(-1, s, s),
                sample_pos.labels.reshape(-1), pos_flat, axis_name,
            )

        total = rpn_loc_loss + rpn_cls_loss + roi_loc_loss + roi_cls_loss + mask_loss
        bd = L.LossBreakdown(
            total, rpn_loc_loss, rpn_cls_loss, roi_loc_loss, roi_cls_loss,
            mask_loss,
        )
        return total, (bd, mut2["batch_stats"])

    accum = cfg.train.grad_accum_steps
    if cfg.train.batch_size % max(accum, 1) != 0:
        raise ValueError(
            f"batch_size {cfg.train.batch_size} not divisible by "
            f"grad_accum_steps {accum}"
        )

    def train_step(state: TrainState, batch: Batch):
        if accum > 1 and batch.images.shape[0] % accum != 0:
            # under shard_map the LOCAL shard is what gets micro-split;
            # validate it here (shapes are static at trace) instead of
            # failing later with an opaque reshape error
            raise ValueError(
                f"per-device batch {batch.images.shape[0]} not divisible "
                f"by grad_accum_steps {accum} (global batch "
                f"{cfg.train.batch_size}; with DP the LOCAL shard must "
                "split evenly into micro-batches)"
            )
        key, new_key = jax.random.split(state.key)
        b = cfg.train.batch_size
        # (b, 2) per-image (proposal, anchor) sampling keys by global image
        # index — invariant to how the batch is split into micro-batches
        # (grad accum) AND across shard_map devices (local slice of the
        # global key table below).
        img_keys = jax.random.split(key, b * 2).reshape(b, 2)
        if axis_name is not None:
            # local shard: rows [idx*bl, (idx+1)*bl) of the global table.
            # Typed keys don't support lax.dynamic_slice directly — slice
            # the raw key data and re-wrap (same default impl as split's
            # output).
            bl = batch.images.shape[0]
            kd = jax.random.key_data(img_keys)  # (b, 2, key_words)
            idx = jax.lax.axis_index(axis_name)
            kd = jax.lax.dynamic_slice_in_dim(kd, idx * bl, bl, axis=0)
            img_keys = jax.random.wrap_key_data(kd)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum <= 1:
            (_, (bd, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, batch, img_keys
            )
        else:
            # micro-batch scan: near-identical to the full-batch gradient
            # (losses normalize by each micro-batch's own valid-row count,
            # so averaging micro-gradients differs when counts are uneven;
            # BN is frozen by default and running stats take the last
            # micro-batch), at 1/accum the activation memory. Sampling is
            # split-INVARIANT (per-image keys above), so the divergence is
            # purely normalization (+ batch-stats on trainable-BN configs);
            # measured bound: 0.21 relative L2 / 0.98 cosine of the SGD
            # update on a worst-case uneven tiny_test batch
            # (tests/test_train_variants.py::test_grad_accum_divergence_bounded).
            micro = batch.images.shape[0] // accum
            batch_r = jax.tree.map(
                lambda x: x.reshape(accum, micro, *x.shape[1:]), batch
            )
            keys = img_keys.reshape(accum, micro, 2)

            def body(carry, xs):
                g_acc, bs = carry
                mb, k = xs
                (_, (bd_i, new_bs_i)), g = grad_fn(state.params, bs, mb, k)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, new_bs_i), bd_i

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            # XLA:CPU lowers convolutions inside scan bodies off its fast
            # (Eigen-thunk) path — a tiny micro-step runs ~20× slower than
            # the same graph at top level. Unrolling restores the fast path
            # on CPU (test/dev backend); on TPU the rolled scan is kept for
            # its bounded activation memory (the reason grad-accum exists).
            # MASKRCNN_ROLLED_ACCUM=1 forces the rolled (production-TPU)
            # variant so CPU tests can cover that path too.
            force_rolled = os.environ.get("MASKRCNN_ROLLED_ACCUM") == "1"
            unroll = (accum if jax.default_backend() == "cpu"
                      and not force_rolled else 1)
            (g_sum, new_bs), bds = jax.lax.scan(
                body, (zeros, state.batch_stats), (batch_r, keys),
                unroll=unroll,
            )
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            bd = jax.tree.map(lambda x: jnp.mean(x, axis=0), bds)
        if axis_name is not None:
            # DP reduction. The losses above normalized by GLOBAL valid
            # counts (axis-aware denominators, train/losses.py), so each
            # shard's loss/gradient is its local numerator over the global
            # denominator — psum (NOT pmean) reconstructs the single-device
            # global-batch loss and gradient exactly (round-4 ADVICE: the
            # old pmean of locally-normalized ratios diverged by ~3e-3 on
            # uneven shards). batch_stats keeps pmean: cross-replica
            # averaging of running stats (a no-op under frozen BN).
            grads, bd = jax.lax.psum((grads, bd), axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            key=new_key,
        )
        return new_state, bd._asdict()

    if axis_name is not None:
        return train_step  # caller wraps in shard_map + jit
    if chain > 1:
        def chained_step(state: TrainState, batches: Batch):
            # scan the UNJITTED body: one executable, `chain` steps. On
            # XLA:CPU unroll (conv-in-scan slowdown, see grad-accum note
            # above); on TPU keep the rolled scan — one compiled body,
            # `chain`× less HLO.
            unroll = chain if jax.default_backend() == "cpu" else 1
            return jax.lax.scan(train_step, state, batches, unroll=unroll)

        return jax.jit(chained_step, donate_argnums=(0,))
    return jax.jit(train_step, donate_argnums=(0,))


def init_model(cfg: Config, key: jax.Array):
    """Initialize model variables on the static image bucket."""
    model = MaskRCNN(cfg)
    h, w = cfg.train.image_size
    dummy = jnp.zeros((cfg.train.batch_size, h, w, 3), jnp.float32)
    variables = model.init(key, dummy, method=MaskRCNN.init_forward)
    return model, variables
