"""Pure-numpy golden implementations of the detection glue ops.

Written from the behavioral specs in SURVEY.md §2c (chainercv numerics) —
deliberately naive and loop-based so they are easy to audit. Tests compare
the JAX/Pallas implementations against these.
"""

from __future__ import annotations

import numpy as np


def bbox2loc(src, dst):
    h = src[:, 2] - src[:, 0]
    w = src[:, 3] - src[:, 1]
    cy = src[:, 0] + 0.5 * h
    cx = src[:, 1] + 0.5 * w
    bh = dst[:, 2] - dst[:, 0]
    bw = dst[:, 3] - dst[:, 1]
    bcy = dst[:, 0] + 0.5 * bh
    bcx = dst[:, 1] + 0.5 * bw
    eps = np.finfo(h.dtype).eps
    h = np.maximum(h, eps)
    w = np.maximum(w, eps)
    return np.stack(
        [(bcy - cy) / h, (bcx - cx) / w, np.log(bh / h), np.log(bw / w)], axis=1
    )


def loc2bbox(src, loc):
    h = src[:, 2] - src[:, 0]
    w = src[:, 3] - src[:, 1]
    cy = src[:, 0] + 0.5 * h
    cx = src[:, 1] + 0.5 * w
    ncy = loc[:, 0] * h + cy
    ncx = loc[:, 1] * w + cx
    nh = np.exp(loc[:, 2]) * h
    nw = np.exp(loc[:, 3]) * w
    return np.stack(
        [ncy - 0.5 * nh, ncx - 0.5 * nw, ncy + 0.5 * nh, ncx + 0.5 * nw], axis=1
    )


def box_iou(a, b):
    out = np.zeros((len(a), len(b)), np.float32)
    for i in range(len(a)):
        for j in range(len(b)):
            ty = max(a[i, 0], b[j, 0])
            tx = max(a[i, 1], b[j, 1])
            by = min(a[i, 2], b[j, 2])
            bx = min(a[i, 3], b[j, 3])
            inter = max(0.0, by - ty) * max(0.0, bx - tx)
            aa = max(0.0, (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1]))
            ab = max(0.0, (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1]))
            union = aa + ab - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def greedy_nms(boxes, scores, thresh):
    """Indices kept, score-descending (stable ties by input order)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if not suppressed[j] and j != i:
                if box_iou(boxes[i : i + 1], boxes[j : j + 1])[0, 0] > thresh:
                    if scores[j] < scores[i] or (
                        scores[j] == scores[i]
                        and list(order).index(j) > list(order).index(i)
                    ):
                        suppressed[j] = True
    return np.array(keep, np.int64)


def map_rois_to_fpn_levels(rois, k_min=0, k_max=4):
    area = np.prod(rois[:, 2:] - rois[:, :2], axis=1)
    s = np.sqrt(np.maximum(area, 0.0))
    target = np.floor(4 + np.log2(s / 224.0 + 1e-6))
    return np.clip(target, k_min, k_max).astype(np.int32)


def roi_align(feats_hwc, rois, out_size, spatial_scale, sampling_ratio=2):
    """Naive ROIAlign, Caffe2 semantics (no half-pixel offset). (R,oh,ow,C)."""
    h, w, c = feats_hwc.shape
    oh, ow = out_size
    sr = sampling_ratio
    out = np.zeros((len(rois), oh, ow, c), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c, np.float32)
        y = min(max(y, 0.0), h - 1.0)
        x = min(max(x, 0.0), w - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feats_hwc[y0, x0] * (1 - ly) * (1 - lx)
            + feats_hwc[y0, x1] * (1 - ly) * lx
            + feats_hwc[y1, x0] * ly * (1 - lx)
            + feats_hwc[y1, x1] * ly * lx
        )

    for r, roi in enumerate(rois):
        ys, xs, ye, xe = roi * spatial_scale
        rh = max(ye - ys, 1.0)
        rw = max(xe - xs, 1.0)
        bh, bw = rh / oh, rw / ow
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c, np.float32)
                for si in range(sr):
                    for sj in range(sr):
                        y = ys + bh * (i + (si + 0.5) / sr)
                        x = xs + bw * (j + (sj + 0.5) / sr)
                        acc += bilinear(y, x)
                out[r, i, j] = acc / (sr * sr)
    return out
