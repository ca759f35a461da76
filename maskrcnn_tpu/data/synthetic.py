"""Synthetic detection data — deterministic COCO-shaped batches.

Fills the role of the reference's tiny smoke setups (it has none; SURVEY §4
lists "tiny-synthetic-COCO integration test" as a gap to fill). Generates
images of colored rectangles/ellipses with exact boxes, instance masks
(stored as fixed-size box crops, the on-device target format) and simple
keypoint skeletons. Used by tests, bench.py, and the CLI ``--dataset
synthetic`` path.
"""

from __future__ import annotations

import numpy as np

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.train.step import Batch


class SyntheticDetectionData:
    """Infinite deterministic stream of fixed-shape batches."""

    def __init__(self, cfg: Config, n_keypoints: int | None = None, seed: int = 0):
        self.cfg = cfg
        self.n_keypoints = n_keypoints or cfg.model.n_keypoints
        self.seed = seed
        self.is_keypoint = cfg.model.head == "fpn_keypoint"

    def _make_example(self, rng: np.random.RandomState):
        cfg = self.cfg
        h, w = cfg.train.image_size
        g = cfg.train.max_gt
        s = cfg.train.gt_mask_size
        img = rng.uniform(0.0, 0.15, (h, w, 3)).astype(np.float32)

        n_obj = rng.randint(1, min(6, g) + 1)
        boxes = np.zeros((g, 4), np.float32)
        labels = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        masks = np.zeros((g, s, s), np.float32)
        kps = np.zeros((g, self.n_keypoints, 3), np.float32)

        for i in range(n_obj):
            bh = rng.uniform(h * 0.15, h * 0.5)
            bw = rng.uniform(w * 0.15, w * 0.5)
            y0 = rng.uniform(0, h - bh)
            x0 = rng.uniform(0, w - bw)
            y1, x1 = y0 + bh, x0 + bw
            cls = rng.randint(0, cfg.model.n_fg_class)
            # class determines color (learnable classification): a fixed
            # per-class palette hue + small jitter.
            base = np.array([
                ((cls * 2654435761) % 255) / 255.0,
                ((cls * 40503 + 89) % 255) / 255.0,
                ((cls * 9176 + 191) % 255) / 255.0,
            ], np.float32)
            color = np.clip(
                0.35 + 0.6 * base + rng.uniform(-0.05, 0.05, 3), 0.0, 1.0
            ).astype(np.float32)
            shape_kind = rng.randint(0, 2)

            # rasterize only within the box slice — a full-image mgrid per
            # object made generation host-bound (~40 ms/image at 512²; the
            # 1-core host then starves the chip at 4-6 img/s)
            iy0, iy1 = int(np.floor(y0)), min(int(np.ceil(y1)), h)
            ix0, ix1 = int(np.floor(x0)), min(int(np.ceil(x1)), w)
            yy, xx = np.mgrid[iy0:iy1, ix0:ix1].astype(np.float32)
            if shape_kind == 0:  # rectangle
                inside = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
            else:  # ellipse
                cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
                inside = ((yy - cy) / (bh / 2)) ** 2 + ((xx - cx) / (bw / 2)) ** 2 <= 1.0
            img[iy0:iy1, ix0:ix1][inside] = color

            boxes[i] = [y0, x0, y1, x1]
            labels[i] = cls
            valid[i] = True

            # mask crop: rasterize 'inside' within the box at s×s
            cy_lin = y0 + (np.arange(s) + 0.5) / s * bh
            cx_lin = x0 + (np.arange(s) + 0.5) / s * bw
            gy, gx = np.meshgrid(cy_lin, cx_lin, indexing="ij")
            if shape_kind == 0:
                masks[i] = 1.0
            else:
                cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
                masks[i] = (
                    ((gy - cy) / (bh / 2)) ** 2 + ((gx - cx) / (bw / 2)) ** 2 <= 1.0
                ).astype(np.float32)

            # keypoints: deterministic lattice inside the box, all visible
            k = self.n_keypoints
            t = (np.arange(k) + 0.5) / k
            kps[i, :, 0] = y0 + t * bh
            kps[i, :, 1] = x0 + (1.0 - t) * bw
            kps[i, :, 2] = 2.0

        return img, boxes, labels, valid, masks, kps

    def batch(self, index: int) -> Batch:
        cfg = self.cfg
        b = cfg.train.batch_size
        h, w = cfg.train.image_size
        rng = np.random.RandomState(self.seed * 100_003 + index)
        ims, bxs, lbs, vds, mks, kps = [], [], [], [], [], []
        for _ in range(b):
            im, bx, lb, vd, mk, kp = self._make_example(rng)
            ims.append(im)
            bxs.append(bx)
            lbs.append(lb)
            vds.append(vd)
            mks.append(mk)
            kps.append(kp)
        return Batch(
            # uint8 transport (extract normalizes /255 on device, exact
            # for these 8-bit-quantized values; matches the COCO loader).
            # Together with uint8 masks this cuts per-step H2D from
            # ~52 MB to ~12.7 MB at 512²b8 — load-bearing on the axon
            # tunnel, whose client RETAINS every transfer buffer host-side
            # (measured 26 MB RSS/step leak → OOM at 128 GB mid-run;
            # BASELINE.md round 5).
            images=(np.stack(ims) * 255.0 + 0.5).astype(np.uint8),
            img_hw=np.full((b, 2), (h, w), np.float32),
            scale=np.ones((b,), np.float32),
            gt_boxes=np.stack(bxs),
            gt_labels=np.stack(lbs),
            gt_valid=np.stack(vds),
            # uint8 transport (exact here: synthetic masks are binary) —
            # quarters the dominant per-step H2D tensor; mask_targets
            # normalizes back on device
            gt_masks=None if self.is_keypoint else
            (np.stack(mks) * 255.0 + 0.5).astype(np.uint8),
            gt_keypoints=np.stack(kps) if self.is_keypoint else None,
        )

    def iter_from(self, step: int = 0):
        """Step-pure stream: batch(i) is a pure function of i, so resuming
        at step k replays exactly what an uninterrupted run would see."""
        i = step
        while True:
            yield self.batch(i)
            i += 1

    def __iter__(self):
        return self.iter_from(0)
