"""Host-side postprocessing: mask pasting and keypoint decoding.

Spec: the tail of reference ``MaskRCNN.predict``
(chainer_maskrcnn/model/maskrcnn.py:231-251): sigmoid mask probs are resized
to the detection box extent, binarized at 127/255, and pasted into a
full-resolution boolean canvas; the keypoint variant instead argmaxes each
56×56 heatmap into image coordinates (reference viewer.py:94-106).
"""

from __future__ import annotations

import numpy as np


def paste_masks(
    det_boxes: np.ndarray,  # (D, 4) yxyx in ORIGINAL image coords
    mask_probs: np.ndarray,  # (D, S, S) sigmoid probabilities
    valid: np.ndarray,  # (D,) bool
    img_hw: tuple[int, int],
    threshold: float = 0.5,
) -> np.ndarray:
    """(D_valid, H, W) bool masks pasted at full resolution."""
    import cv2

    h, w = img_hw
    out = []
    for i in np.where(valid)[0]:
        y0, x0, y1, x1 = det_boxes[i]
        y0i, x0i = int(np.floor(y0)), int(np.floor(x0))
        y1i, x1i = int(np.ceil(y1)), int(np.ceil(x1))
        y0i, x0i = max(y0i, 0), max(x0i, 0)
        y1i, x1i = min(y1i, h), min(x1i, w)
        canvas = np.zeros((h, w), bool)
        bh, bw = y1i - y0i, x1i - x0i
        if bh > 0 and bw > 0:
            m = cv2.resize(mask_probs[i].astype(np.float32), (bw, bh),
                           interpolation=cv2.INTER_LINEAR)
            canvas[y0i:y1i, x0i:x1i] = m >= threshold
        out.append(canvas)
    return np.stack(out) if out else np.zeros((0, h, w), bool)


def decode_keypoints(
    det_boxes: np.ndarray,  # (D, 4) yxyx in ORIGINAL image coords
    heatmaps: np.ndarray,  # (D, S, S, K) logits
    valid: np.ndarray,  # (D,) bool
) -> np.ndarray:
    """(D_valid, K, 3) — (y, x, score) per keypoint.

    Reference viewer.py:94-106: argmax over the S×S heatmap, bin center →
    box-relative → image coordinates; score = softmax prob of the argmax bin.
    """
    d, s, _, k = heatmaps.shape
    out = []
    for i in np.where(valid)[0]:
        y0, x0, y1, x1 = det_boxes[i]
        bh = max(y1 - y0, 1e-3)
        bw = max(x1 - x0, 1e-3)
        flat = heatmaps[i].reshape(s * s, k)
        e = np.exp(flat - flat.max(axis=0, keepdims=True))
        prob = e / e.sum(axis=0, keepdims=True)
        idx = flat.argmax(axis=0)  # (K,)
        ys = (idx // s + 0.5) / s * bh + y0
        xs = (idx % s + 0.5) / s * bw + x0
        sc = prob[idx, np.arange(k)]
        out.append(np.stack([ys, xs, sc], axis=1))
    return np.stack(out) if out else np.zeros((0, k, 3), np.float32)
