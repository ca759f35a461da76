"""Tests for on-device anchor/proposal target creation.

Sampling is stochastic (stateless PRNG) so tests check invariants that the
reference's np.random.choice-based sampler also guarantees (SURVEY §7
hard-part 1: parity defined at the invariant/metric level, not bit level).
"""

import jax
import jax.numpy as jnp
import numpy as np

import golden
from maskrcnn_tpu.targets import (
    anchor_targets,
    keypoint_targets,
    mask_targets,
    proposal_targets,
)
from maskrcnn_tpu.ops import loc2bbox


def _setup_gt():
    gt_boxes = np.zeros((1, 4, 4), np.float32)
    gt_boxes[0, 0] = [10, 10, 50, 50]
    gt_boxes[0, 1] = [60, 60, 90, 100]
    gt_valid = np.array([[True, True, False, False]])
    gt_labels = np.array([[2, 0, 0, 0]], np.int32)
    return jnp.asarray(gt_boxes), jnp.asarray(gt_valid), jnp.asarray(gt_labels)


class TestAnchorTargets:
    def _anchors(self):
        # Dense grid of 16x16 anchors over a 128x128 image + a few giants.
        xs = np.arange(0, 112, 8, dtype=np.float32)
        grid = np.array([[y, x, y + 16, x + 16] for y in xs for x in xs])
        outside = np.array([[-10, -10, 200, 200], [100, 100, 300, 300]], np.float32)
        return jnp.asarray(np.concatenate([grid, outside]))

    def test_invariants(self):
        anchors = self._anchors()
        gt_boxes, gt_valid, _ = _setup_gt()
        img_hw = jnp.asarray([[128.0, 128.0]])
        out = anchor_targets(
            jax.random.key(0), anchors, gt_boxes, gt_valid, img_hw,
            n_sample=64,
        )
        labels = np.asarray(out.labels[0])
        # Outside anchors always ignored.
        assert (labels[-2:] == -1).all()
        # Sample budget respected.
        assert (labels >= 0).sum() <= 64
        n_pos = (labels == 1).sum()
        assert 1 <= n_pos <= 32
        # Every positive has IoU>=thresh or is a gt-argmax anchor.
        iou = golden.box_iou(np.asarray(anchors), np.asarray(gt_boxes[0, :2]))
        mx = iou.max(1)
        gt_argmax_vals = iou.max(0)
        for i in np.where(labels == 1)[0]:
            assert mx[i] >= 0.7 - 1e-6 or np.isclose(iou[i], gt_argmax_vals).any()
        # Every negative has max IoU < 0.3.
        for i in np.where(labels == 0)[0]:
            assert mx[i] < 0.3
        # Loc targets decode back to the assigned GT for positives.
        locs = np.asarray(out.locs[0])
        pos = np.where(labels == 1)[0]
        decoded = np.asarray(
            loc2bbox(anchors[pos], jnp.asarray(locs[pos]))
        )
        assign = iou.argmax(1)[pos]
        np.testing.assert_allclose(
            decoded, np.asarray(gt_boxes[0, :2])[assign], atol=1e-3
        )

    def test_no_gt_all_negative_or_ignore(self):
        anchors = self._anchors()
        gt_boxes = jnp.zeros((1, 4, 4))
        gt_valid = jnp.zeros((1, 4), bool)
        out = anchor_targets(
            jax.random.key(0), anchors, gt_boxes, gt_valid,
            jnp.asarray([[128.0, 128.0]]), n_sample=64,
        )
        labels = np.asarray(out.labels[0])
        assert (labels != 1).all()
        assert (labels == 0).sum() <= 64


class TestProposalTargets:
    def _sample(self, seed=0, n_sample=32):
        rng = np.random.RandomState(seed)
        gt_boxes, gt_valid, gt_labels = _setup_gt()
        # proposals: jittered copies of GT (positives) + far boxes (negatives)
        pos = np.repeat(np.asarray(gt_boxes[0, :2]), 10, axis=0)
        pos += rng.uniform(-2, 2, pos.shape).astype(np.float32)
        neg = np.array([[200, 200, 240, 240]] * 20, np.float32)
        neg += rng.uniform(-5, 5, neg.shape).astype(np.float32)
        rois = jnp.asarray(np.concatenate([pos, neg])[None])
        roi_valid = jnp.ones((1, 40), bool)
        roi_levels = jnp.zeros((1, 40), jnp.int32)
        return proposal_targets(
            jax.random.key(seed), rois, roi_valid, roi_levels,
            gt_boxes, gt_labels, gt_valid, n_sample=n_sample,
        ), gt_boxes, gt_labels

    def test_invariants(self):
        out, gt_boxes, gt_labels = self._sample()
        labels = np.asarray(out.labels[0])
        valid = np.asarray(out.valid[0])
        is_pos = np.asarray(out.is_pos[0])
        # positives first, then negatives
        n_pos = is_pos.sum()
        assert n_pos <= 8  # 32 * 0.25
        assert is_pos[:n_pos].all() and not is_pos[n_pos:].any()
        # positive labels in [1, n_class); negative slots labeled 0
        assert (labels[is_pos] >= 1).all()
        assert (labels[~is_pos] == 0).all()
        # sampled positives overlap their assigned GT
        rois = np.asarray(out.rois[0])
        assign = np.asarray(out.assignment[0])
        for i in np.where(is_pos & valid)[0]:
            iou = golden.box_iou(rois[i : i + 1], np.asarray(gt_boxes[0])[assign[i] : assign[i] + 1])
            assert iou[0, 0] >= 0.5 - 1e-6
        # loc targets decode back to assigned GT (after unnormalize)
        locs = np.asarray(out.locs[0]) * np.array([0.1, 0.1, 0.2, 0.2]) + 0.0
        decoded = np.asarray(loc2bbox(jnp.asarray(rois), jnp.asarray(locs)))
        for i in np.where(is_pos & valid)[0]:
            np.testing.assert_allclose(
                decoded[i], np.asarray(gt_boxes[0])[assign[i]], atol=1e-2
            )

    def test_gt_boxes_become_positive_candidates(self):
        # With no good proposals at all, the appended GTs guarantee positives.
        gt_boxes, gt_valid, gt_labels = _setup_gt()
        rois = jnp.asarray(np.array([[[200, 200, 220, 220]] * 5], np.float32))
        out = proposal_targets(
            jax.random.key(1), rois, jnp.ones((1, 5), bool),
            jnp.zeros((1, 5), jnp.int32), gt_boxes, gt_labels, gt_valid,
            n_sample=16,
        )
        assert int(out.is_pos.sum()) == 2  # exactly the two valid GTs

    def test_mask_targets_identity_roi(self):
        # ROI == GT box ⇒ target ≈ the GT crop itself (resampled).
        gt_boxes, gt_valid, gt_labels = _setup_gt()
        s = 28
        gmask = np.zeros((1, 4, s, s), np.float32)
        gmask[0, 0, : s // 2] = 1.0  # top half foreground
        rois = gt_boxes[:, :1, :]
        sample = proposal_targets(
            jax.random.key(0), rois, jnp.ones((1, 1), bool),
            jnp.zeros((1, 1), jnp.int32), gt_boxes, gt_labels, gt_valid,
            n_sample=4,
        )
        t = mask_targets(sample, jnp.asarray(gmask), gt_boxes, mask_size=28)
        t0 = np.asarray(t[0][np.asarray(sample.is_pos[0])])[0]
        assert t0[:13].mean() > 0.95  # top rows fg
        assert t0[15:].mean() < 0.05  # bottom rows bg

    def test_keypoint_targets_encoding(self):
        gt_boxes, gt_valid, gt_labels = _setup_gt()
        # GT 0 box [10,10,50,50]; keypoint at its center, visible.
        kps = np.zeros((1, 4, 3, 3), np.float32)
        kps[0, 0, 0] = [30, 30, 2]  # center, visible
        kps[0, 0, 1] = [30, 30, 1]  # labeled but invisible → ignore
        kps[0, 0, 2] = [500, 500, 2]  # out of roi → ignore
        rois = gt_boxes[:, :1, :]
        sample = proposal_targets(
            jax.random.key(0), rois, jnp.ones((1, 1), bool),
            jnp.zeros((1, 1), jnp.int32), gt_boxes, gt_labels, gt_valid,
            n_sample=4,
        )
        t = keypoint_targets(sample, jnp.asarray(kps), mask_size=56)
        row = np.asarray(t[0][np.asarray(sample.is_pos[0])])[0]
        exp = 28 * 56 + 28  # center bin
        assert row[0] == exp
        assert row[1] == -1
        assert row[2] == -1
