"""COCO results-JSON export: standard ``segm``/``bbox``/``keypoints`` files.

The reference never emits COCO result files (its evaluator computes VOC mAP
in-process, reference evaluator.py:86-90). This export closes the
real-artifact verification loop instead: results written here are in the
exact format ``pycocotools.COCOeval`` loads (``loadRes``), so anyone with
real COCO annotations and pycocotools can score this framework's detections
offline and diff against the reference checkpoints — the AP-parity check
this environment cannot run (no dataset, no network).

Masks are encoded with the same modified-LEB128 column-major RLE pycocotools
uses (inverse of data/coco.py::_decode_compressed_counts, which was written
from pycocotools' rleFrString); round-trip through that decoder is tested.
"""

from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp


def _encode_compressed_counts(counts) -> str:
    """pycocotools rleToString: 6-bit chunks, continuation bit, delta from
    counts[i-2] for i > 2, printable offset 48."""
    out = []
    counts = [int(c) for c in counts]
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5  # arithmetic shift: negatives stay negative
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def rle_encode(mask: np.ndarray) -> dict:
    """(H, W) bool/0-1 mask → COCO compressed RLE dict (column-major runs,
    first run counts zeros)."""
    h, w = mask.shape
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    if flat.size == 0:
        return {"size": [h, w], "counts": ""}
    change = np.flatnonzero(flat[1:] != flat[:-1])
    counts = np.diff(np.concatenate([[-1], change, [flat.size - 1]]))
    if flat[0] == 1:  # runs always start with a (possibly zero) 0-run
        counts = np.concatenate([[0], counts])
    return {"size": [int(h), int(w)],
            "counts": _encode_compressed_counts(counts)}


def _predict_index_order(cfg, model, variables, loader, n_images,
                         predict_cache):
    """Shared export driver: iterate ``loader``'s images in index order
    (NOT the shuffled epoch order), predict batch-by-batch, and yield
    ``(image_index, batch_slot, batch, detections)`` per real image.
    The last chunk pads by repeating its final index; padded slots are not
    yielded. ``predict_cache`` maps image_size → compiled predict fn and can
    be shared with ``evaluate_dataset`` to avoid recompiling predict for the
    same bucket in one process (a cold predict compile runs minutes on TPU).
    """
    from maskrcnn_tpu.eval.predict import make_predict_fn

    if loader.flip:
        raise ValueError("export requires a flip=False loader "
                         "(deterministic, un-augmented examples)")
    bs = cfg.train.batch_size
    n = len(loader.ids) if n_images is None else min(n_images,
                                                     len(loader.ids))

    def predict_for(hw):
        if hw not in predict_cache:
            predict_cache[hw] = make_predict_fn(cfg, model, image_size=hw)
        return predict_cache[hw]

    for start in range(0, n, bs):
        idx = list(range(start, min(start + bs, n)))
        pad = bs - len(idx)
        batch = loader.batch(idx + [idx[-1]] * pad)
        predict = predict_for(tuple(batch.images.shape[1:3]))
        det = predict(
            variables,
            jnp.asarray(batch.images),
            jnp.asarray(batch.img_hw),
            jnp.asarray(batch.scale),
        )
        det = jax.device_get(det)
        for k, i in enumerate(idx):
            yield i, k, batch, det


def export_coco_results(
    cfg,
    model,
    variables,
    loader,  # COCODetectionLoader with flip=False
    out_path: str,
    n_images: int | None = None,
    score_thresh: float = 0.0,
    predict_cache: dict | None = None,
) -> int:
    """Run predict over ``loader``'s images in index order and write a COCO
    results JSON (segm format: image_id/category_id/segmentation/score/bbox).
    Detections are mapped back to ORIGINAL image coordinates (predict runs
    on the resized/padded bucket; boxes divide by the per-image scale) and
    category ids back to the annotation file's sparse ids. Returns the
    number of result entries written."""
    from maskrcnn_tpu.eval.postprocess import paste_masks

    if predict_cache is None:
        predict_cache = {}
    results = []
    n_cats = len(loader.index.cat_ids)
    for i, k, batch, det in _predict_index_order(
            cfg, model, variables, loader, n_images, predict_cache):
        if det.masks is None:
            raise ValueError("COCO segm export needs a mask head "
                             f"(head={cfg.model.head!r} yields no masks)")
        img_id = loader.ids[i]
        info = loader.index.images[img_id]
        h0, w0 = int(info["height"]), int(info["width"])
        scale = float(batch.scale[k])
        valid = det.valid[k] & (det.scores[k] >= score_thresh)
        boxes0 = det.boxes[k] / scale  # original coords, yxyx
        masks = paste_masks(boxes0, det.masks[k], valid, (h0, w0))
        labels = det.labels[k][valid]
        scores = det.scores[k][valid]
        sel = boxes0[valid]
        for d in range(len(scores)):
            if not 0 <= int(labels[d]) < n_cats:
                # the model was built with more fg classes than the
                # annotation file declares (n_fg_class > #categories);
                # such detections have no COCO category — they could
                # never score as TPs, so drop rather than crash
                continue
            y0, x0, y1, x1 = (float(v) for v in sel[d])
            results.append({
                "image_id": int(img_id),
                "category_id": int(loader.index.cat_ids[int(labels[d])]),
                "segmentation": rle_encode(masks[d]),
                "bbox": [round(x0, 2), round(y0, 2),
                         round(x1 - x0, 2), round(y1 - y0, 2)],
                "score": round(float(scores[d]), 5),
            })
    with open(out_path, "w") as f:
        json.dump(results, f)
    return len(results)


def export_coco_keypoint_results(
    cfg,
    model,
    variables,
    loader,  # COCODetectionLoader(keypoints=True) with flip=False
    out_path: str,
    n_images: int | None = None,
    score_thresh: float = 0.0,
    predict_cache: dict | None = None,
) -> int:
    """COCO person-keypoints results JSON: ``keypoints`` as the flat
    [x1, y1, v1, x2, y2, v2, ...] list in ORIGINAL image coordinates
    (pycocotools loadRes keypoint format; v slots carry the per-keypoint
    heatmap confidence — loadRes ignores them for scoring, which uses
    ``score``). Returns the number of result entries."""
    from maskrcnn_tpu.eval.postprocess import decode_keypoints

    if predict_cache is None:
        predict_cache = {}
    cat_id = loader.index.cat_ids[0] if loader.index.cat_ids else 1
    results = []
    for i, k, batch, det in _predict_index_order(
            cfg, model, variables, loader, n_images, predict_cache):
        if det.heatmaps is None:
            raise ValueError("keypoint export needs a keypoint head "
                             f"(head={cfg.model.head!r} yields no heatmaps)")
        img_id = loader.ids[i]
        scale = float(batch.scale[k])
        valid = det.valid[k] & (det.scores[k] >= score_thresh)
        boxes0 = det.boxes[k] / scale
        kps = decode_keypoints(boxes0, det.heatmaps[k], valid)
        scores = det.scores[k][valid]
        sel = boxes0[valid]
        for d in range(len(scores)):
            flat = []
            for y, x, v in kps[d]:
                flat += [round(float(x), 2), round(float(y), 2),
                         round(float(v), 4)]
            y0, x0, y1, x1 = (float(v) for v in sel[d])
            results.append({
                "image_id": int(img_id),
                "category_id": int(cat_id),
                "keypoints": flat,
                "bbox": [round(x0, 2), round(y0, 2),
                         round(x1 - x0, 2), round(y1 - y0, 2)],
                "score": round(float(scores[d]), 5),
            })
    with open(out_path, "w") as f:
        json.dump(results, f)
    return len(results)
