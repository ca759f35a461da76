"""Dataset evaluator — the reference's InstanceSegmentationVOCEvaluator.

Spec: reference evaluator.py:11-104: run ``predict`` over a validation
iterator, compute VOC mask mAP@0.5, report ``map`` + per-class ``ap/<name>``.
Additions (gaps per SURVEY §2 #21): COCO-style AP (IoU 0.50:0.95) and box AP
are reported alongside.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.eval.detection_eval import (
    eval_instance_segmentation_coco_style,
    eval_instance_segmentation_voc,
)
from maskrcnn_tpu.eval.postprocess import paste_masks
from maskrcnn_tpu.eval.predict import make_predict_fn


def crop_to_full_mask(gt_masks_crops, gt_boxes, gt_valid, img_hw):
    """Rasterize per-GT box-crop masks back to full resolution (host)."""
    import cv2

    h, w = img_hw
    out, labels_out = [], None
    full = []
    for i in np.where(gt_valid)[0]:
        y0, x0, y1, x1 = gt_boxes[i]
        y0i, x0i = max(int(np.floor(y0)), 0), max(int(np.floor(x0)), 0)
        y1i, x1i = min(int(np.ceil(y1)), h), min(int(np.ceil(x1)), w)
        canvas = np.zeros((h, w), bool)
        if y1i > y0i and x1i > x0i:
            crop = gt_masks_crops[i].astype(np.float32)
            if gt_masks_crops.dtype == np.uint8:
                crop /= 255.0  # uint8 transport encodes [0,1] as 0..255
            m = cv2.resize(
                crop,
                (x1i - x0i, y1i - y0i), interpolation=cv2.INTER_LINEAR,
            )
            canvas[y0i:y1i, x0i:x1i] = m >= 0.5
        full.append(canvas)
    return np.stack(full) if full else np.zeros((0, h, w), bool)


def evaluate_dataset(
    cfg: Config,
    model,
    variables,
    batches,  # iterable of Batch with gt_masks present
    n_batches: int,
    label_names: list[str] | None = None,
    predict_cache: dict | None = None,
) -> dict:
    """Runs the two-pass predict over ``n_batches`` and computes mask mAP.

    ``predict_cache`` (image_size → compiled predict fn) can be shared with
    the results exporters so one process compiles predict once per bucket.
    """
    # multi-bucket input yields mixed static shapes: one predict per bucket
    if predict_cache is None:
        predict_cache = {}

    def predict_for(hw):
        if hw not in predict_cache:
            predict_cache[hw] = make_predict_fn(cfg, model, image_size=hw)
        return predict_cache[hw]

    pred_masks, pred_labels, pred_scores = [], [], []
    gt_masks_all, gt_labels_all = [], []

    for bi, batch in zip(range(n_batches), batches):
        predict = predict_for(tuple(batch.images.shape[1:3]))
        det = predict(
            variables,
            jnp.asarray(batch.images),
            jnp.asarray(batch.img_hw),
            jnp.asarray(batch.scale),
        )
        det = jax.device_get(det)
        b = batch.images.shape[0]
        for i in range(b):
            hw = (int(batch.img_hw[i][0]), int(batch.img_hw[i][1]))
            valid = det.valid[i]
            masks = paste_masks(det.boxes[i], det.masks[i], valid, hw)
            pred_masks.append(masks)
            pred_labels.append(det.labels[i][valid])
            pred_scores.append(det.scores[i][valid])
            gt_masks_all.append(
                crop_to_full_mask(
                    np.asarray(batch.gt_masks[i]),
                    np.asarray(batch.gt_boxes[i]),
                    np.asarray(batch.gt_valid[i]),
                    hw,
                )
            )
            gt_labels_all.append(
                np.asarray(batch.gt_labels[i])[np.asarray(batch.gt_valid[i])]
            )

    n_class = cfg.model.n_fg_class
    voc = eval_instance_segmentation_voc(
        pred_masks, pred_labels, pred_scores, gt_masks_all, gt_labels_all,
        n_class,
    )
    # full pycocotools-semantics evaluation (101-pt AP, area ranges,
    # maxDets tiers; crowd regions never reach the Batch pipeline — the
    # loader skips iscrowd annotations exactly like the reference,
    # coco_dataset.py:69-97 — so gt_crowd stays empty here)
    from maskrcnn_tpu.eval.coco_eval import evaluate_coco

    coco = evaluate_coco(
        pred_masks, pred_labels, pred_scores, gt_masks_all, gt_labels_all,
        n_class,
    )
    report = {"map": voc["map"], "coco/map": coco["AP"],
              "coco/map50": coco["AP50"], "coco/map75": coco["AP75"],
              "coco/map_small": coco["APs"], "coco/map_medium": coco["APm"],
              "coco/map_large": coco["APl"], "coco/ar1": coco["AR1"],
              "coco/ar10": coco["AR10"], "coco/ar100": coco["AR100"]}
    names = label_names or [str(i) for i in range(n_class)]
    for i, name in enumerate(names):
        if np.isfinite(voc["ap"][i]):
            report[f"ap/{name}"] = float(voc["ap"][i])
    return report


def evaluate_keypoint_dataset(
    cfg: Config,
    model,
    variables,
    batches,  # iterable of Batch with gt_keypoints present
    n_batches: int,
    predict_cache: dict | None = None,
) -> dict:
    """OKS keypoint AP over a dataset (new capability — the reference trains
    keypoint models but never evaluates them, SURVEY §2 #21)."""
    from maskrcnn_tpu.eval.keypoint_eval import eval_keypoints_oks_ap
    from maskrcnn_tpu.eval.postprocess import decode_keypoints

    if predict_cache is None:
        predict_cache = {}

    def predict_for(hw):
        if hw not in predict_cache:
            predict_cache[hw] = make_predict_fn(cfg, model, image_size=hw)
        return predict_cache[hw]

    pred_kps, pred_scores = [], []
    gt_kps, gt_areas = [], []
    for bi, batch in zip(range(n_batches), batches):
        predict = predict_for(tuple(batch.images.shape[1:3]))
        det = predict(
            variables,
            jnp.asarray(batch.images),
            jnp.asarray(batch.img_hw),
            jnp.asarray(batch.scale),
        )
        det = jax.device_get(det)
        for i in range(batch.images.shape[0]):
            valid = det.valid[i]
            kps = decode_keypoints(det.boxes[i], det.heatmaps[i], valid)
            pred_kps.append(kps)
            pred_scores.append(det.scores[i][valid])
            gv = np.asarray(batch.gt_valid[i])
            gt_kps.append(np.asarray(batch.gt_keypoints[i])[gv])
            boxes = np.asarray(batch.gt_boxes[i])[gv]
            gt_areas.append(
                (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            )
    return eval_keypoints_oks_ap(pred_kps, pred_scores, gt_kps, gt_areas)
