"""Tests for predict + AP evaluation: perfect predictions score mAP 1.0,
and a briefly-trained tiny model achieves nonzero mAP on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.eval.detection_eval import (
    eval_instance_segmentation_coco_style,
    eval_instance_segmentation_voc,
    mask_iou,
)


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


class TestMaskIoU:
    def test_identity(self):
        m = _disk(32, 32, 16, 16, 8)[None]
        np.testing.assert_allclose(mask_iou(m, m), [[1.0]])

    def test_disjoint(self):
        a = _disk(32, 32, 8, 8, 4)[None]
        b = _disk(32, 32, 24, 24, 4)[None]
        assert mask_iou(a, b)[0, 0] == 0.0


class TestVOCEval:
    def test_perfect_predictions_give_map_1(self):
        gt = [_disk(32, 32, 16, 16, 8)[None], _disk(32, 32, 10, 20, 6)[None]]
        gt_labels = [np.array([1]), np.array([0])]
        res = eval_instance_segmentation_voc(
            [g.copy() for g in gt],
            [l.copy() for l in gt_labels],
            [np.array([0.9]), np.array([0.8])],
            gt, gt_labels, n_class=3,
        )
        assert res["map"] == 1.0

    def test_wrong_class_gets_zero(self):
        gt = [_disk(32, 32, 16, 16, 8)[None]]
        res = eval_instance_segmentation_voc(
            [gt[0].copy()], [np.array([1])], [np.array([0.9])],
            gt, [np.array([0])], n_class=2,
        )
        assert res["map"] == 0.0

    def test_duplicate_detection_is_fp(self):
        gt = [_disk(32, 32, 16, 16, 8)[None]]
        preds = np.concatenate([gt[0], gt[0]])
        res = eval_instance_segmentation_voc(
            [preds], [np.array([0, 0])], [np.array([0.9, 0.8])],
            gt, [np.array([0])], n_class=1,
        )
        # 1 TP + 1 FP at full recall: AP stays 1.0 (dup ranked lower),
        # precision at rank2 = 0.5 but recall already 1.0 at rank1.
        assert res["map"] == 1.0

    def test_coco_style_lower_than_voc_for_coarse_masks(self):
        gt = [_disk(64, 64, 32, 32, 16)[None]]
        pred = [_disk(64, 64, 32, 32, 14)[None]]  # slightly smaller: IoU≈0.77
        voc = eval_instance_segmentation_voc(
            pred, [np.array([0])], [np.array([0.9])], gt, [np.array([0])], 1
        )
        coco = eval_instance_segmentation_coco_style(
            pred, [np.array([0])], [np.array([0.9])], gt, [np.array([0])], 1
        )
        assert voc["map"] == 1.0
        assert 0.0 < coco["map"] < 1.0


@pytest.mark.slow
def test_trained_tiny_model_nonzero_map():
    """End-to-end: train the tiny model 60 steps on one synthetic batch,
    evaluate on that batch — mAP must clear a low bar (sanity that predict,
    postprocess, and eval wire together)."""
    from maskrcnn_tpu.data import SyntheticDetectionData
    from maskrcnn_tpu.eval.evaluator import evaluate_dataset
    from maskrcnn_tpu.train import create_train_state, init_model, make_train_step

    cfg = cfg_lib.tiny_test()
    model, variables = init_model(cfg, jax.random.key(0))
    state = create_train_state(cfg, variables, jax.random.key(1))
    step = make_train_step(cfg, model)
    data = SyntheticDetectionData(cfg)
    batch = jax.tree.map(jnp.asarray, data.batch(0))
    for _ in range(60):
        state, metrics = step(state, batch)
    assert float(metrics["loss"]) < 1.5

    report = evaluate_dataset(
        cfg, model,
        {"params": state.params, "batch_stats": state.batch_stats},
        iter([data.batch(0)]), 1,
    )
    assert report["map"] > 0.05, report


class TestKeypointEval:
    def test_oks_perfect_match(self):
        from maskrcnn_tpu.eval.keypoint_eval import oks
        gt = np.zeros((17, 3), np.float32)
        gt[:, 0] = np.arange(17) * 5.0
        gt[:, 1] = np.arange(17) * 3.0
        gt[:, 2] = 2
        assert oks(gt[:, :2], gt, area=100.0) == pytest.approx(1.0)

    def test_oks_decreases_with_distance(self):
        from maskrcnn_tpu.eval.keypoint_eval import oks
        gt = np.zeros((17, 3), np.float32)
        gt[:, 2] = 2
        near = gt[:, :2] + 1.0
        far = gt[:, :2] + 10.0
        assert oks(near, gt, 100.0) > oks(far, gt, 100.0)

    def test_ap_perfect_predictions(self):
        from maskrcnn_tpu.eval.keypoint_eval import eval_keypoints_oks_ap
        gt = np.zeros((2, 17, 3), np.float32)
        gt[:, :, 0] = np.arange(17) * 4
        gt[0, :, 1] = 10
        gt[1, :, 1] = 50
        gt[:, :, 2] = 2
        pred = gt.copy()
        pred[:, :, 2] = 0.9  # scores channel
        res = eval_keypoints_oks_ap(
            [pred], [np.array([0.9, 0.8])], [gt], [np.array([900.0, 900.0])]
        )
        assert res["ap"] == pytest.approx(1.0)
        assert res["ap75"] == pytest.approx(1.0)

    def test_pck(self):
        from maskrcnn_tpu.eval.keypoint_eval import pck
        gt = np.zeros((1, 17, 3), np.float32)
        gt[:, :, 2] = 2
        pred = gt.copy()
        pred[:, :8, 0] += 100.0  # 8 of 17 keypoints far off
        boxes = np.array([[0, 0, 50, 50]], np.float32)
        got = pck([pred], [gt], [boxes])
        assert got == pytest.approx(9 / 17)


def test_predict_zero_detections_is_clean():
    """High score threshold + untrained net → all slots invalid, all finite."""
    import jax
    from maskrcnn_tpu.eval import make_predict_fn
    from maskrcnn_tpu.train import init_model

    cfg = cfg_lib.use_preset(cfg_lib.tiny_test(), "visualize")
    model, variables = init_model(cfg, jax.random.key(0))
    predict = make_predict_fn(cfg, model)
    h, w = cfg.train.image_size
    det = predict(variables, jnp.zeros((1, h, w, 3)),
                  jnp.asarray([[h, w]], jnp.float32), jnp.ones((1,)))
    assert int(det.valid.sum()) == 0
    assert bool(jnp.isfinite(det.boxes).all())
    assert bool(jnp.isfinite(det.masks).all())
