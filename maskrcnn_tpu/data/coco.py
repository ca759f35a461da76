"""COCO dataset loader — host pipeline feeding fixed-shape device batches.

Spec: reference ``COCOMaskLoader`` / ``COCOKeypointsLoader``
(chainer_maskrcnn/dataset/coco_dataset.py:11-161) + the Transform wrappers
(train.py:21-37, train_keypoints.py:50-69): images resized so
min side ≤ 600 / max side ≤ 1000 (prepare semantics, maskrcnn.py:261-276),
boxes as (y0, x0, y1, x1) float32, sparse COCO category ids remapped to
contiguous (coco_dataset.py:83-88), per-instance masks, person keypoints as
(y, x, v).

Differences by design (TPU fixed shapes):
- no pycocotools: annotations are parsed with the stdlib json module, RLE
  masks decoded by a small numpy codec (`rle_decode`), polygons rasterized
  with cv2.fillPoly — same outputs, no C dependency (the optional C++
  fast loader in native/ slots in behind the same interface),
- images are pasted into a static padded bucket (cfg.train.image_size) and
  the true content extent travels as ``img_hw``,
- GT masks are stored as fixed-size box crops (cfg.train.gt_mask_size) —
  the on-device target format (see targets/proposal_targets.py),
- GT slots padded/truncated to cfg.train.max_gt with a validity mask.
"""

from __future__ import annotations

import json
import os

import numpy as np

from maskrcnn_tpu.config import Config
from maskrcnn_tpu.train.step import Batch


from maskrcnn_tpu.data import _native


def rle_decode(rle: dict) -> np.ndarray:
    if _native.available():
        return _native.rle_decode(rle)
    return _rle_decode_np(rle)


def _rle_decode_np(rle: dict) -> np.ndarray:
    """Decode COCO RLE (uncompressed counts list or compressed LEB128-style
    string) → (H, W) uint8 mask. Column-major (Fortran) order per COCO spec."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = _decode_compressed_counts(counts.encode("ascii"))
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T  # fortran order


def _decode_compressed_counts(s: bytes) -> list[int]:
    """COCO's modified LEB128 with delta encoding (pycocotools rleFrString)."""
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def polygons_to_mask(polys: list, h: int, w: int) -> np.ndarray:
    if _native.available():
        return _native.polygons_to_mask(polys, h, w)
    return _polygons_to_mask_cv2(polys, h, w)


def _polygons_to_mask_cv2(polys: list, h: int, w: int) -> np.ndarray:
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [
        np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
        for p in polys
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def ann_to_mask(ann: dict, h: int, w: int) -> np.ndarray:
    seg = ann["segmentation"]
    if isinstance(seg, list):
        return polygons_to_mask(seg, h, w)
    if isinstance(seg, dict):
        return rle_decode(seg)
    raise ValueError(f"unknown segmentation format: {type(seg)}")


class COCOIndex:
    """Minimal COCO annotation index (replaces pycocotools.COCO)."""

    def __init__(self, annotation_file: str):
        with open(annotation_file) as f:
            data = json.load(f)
        self.images = {im["id"]: im for im in data["images"]}
        self.cats = {c["id"]: c for c in data.get("categories", [])}
        self.img_anns: dict[int, list] = {}
        for ann in data.get("annotations", []):
            self.img_anns.setdefault(ann["image_id"], []).append(ann)
        # contiguous remap, sorted by original id (reference uses the
        # getCatIds() ordering which is sorted — coco_dataset.py:28,83-88)
        self.cat_ids = sorted(self.cats.keys())
        self.cat_to_contiguous = {c: i for i, c in enumerate(self.cat_ids)}
        self.label_names = [self.cats[c]["name"] for c in self.cat_ids]


class COCODetectionLoader:
    """Yields fixed-shape ``Batch``es for mask or keypoint training."""

    def __init__(self, root: str, split: str, cfg: Config, seed: int = 0,
                 keypoints: bool | None = None, flip: bool = True,
                 min_size: int = 600, max_size: int = 1000,
                 category_filter: list[str] | None = None):
        self.root = root
        self.split = split
        self.cfg = cfg
        self.flip = flip
        self.min_size = min_size
        self.max_size = max_size
        self.keypoints = (
            keypoints if keypoints is not None
            else cfg.model.head == "fpn_keypoint"
        )
        ann_kind = "person_keypoints" if self.keypoints else "instances"
        ann_file = os.path.join(root, "annotations", f"{ann_kind}_{split}.json")
        self.index = COCOIndex(ann_file)
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self._order_cache: tuple[int, np.ndarray] | None = None
        self._waste_sum = 0.0
        self._waste_n = 0
        import threading

        self._waste_lock = threading.Lock()  # get_example runs on a pool
        if self.keypoints:
            # flip must also permute left/right joint rows, not just mirror x
            from maskrcnn_tpu.data.keypoints import (
                flip_permutation,
                keypoint_names,
            )

            self.kp_flip_perm = flip_permutation(
                keypoint_names(cfg.model.n_keypoints))

        # category filter: keep images containing ANY of the named
        # categories (OR semantics, reference coco_dataset.py:30-39)
        self.filter_cat_ids = None
        if category_filter is not None:
            name_to_id = {c["name"]: cid for cid, c in self.index.cats.items()}
            unknown = [n for n in category_filter if n not in name_to_id]
            if unknown:
                raise ValueError(f"unknown COCO categories: {unknown}")
            self.filter_cat_ids = {name_to_id[n] for n in category_filter}

        # images with at least one usable annotation (reference
        # coco_dataset.py:30-39,121-130); skip crowd annotations.
        self.ids = []
        for img_id, anns in self.index.img_anns.items():
            usable = [a for a in anns if not a.get("iscrowd", 0)]
            if self.keypoints:
                usable = [a for a in usable if a.get("num_keypoints", 0) > 0]
            if self.filter_cat_ids is not None:
                usable = [a for a in usable
                          if a["category_id"] in self.filter_cat_ids]
            if usable:
                self.ids.append(img_id)
        self.ids.sort()
        # multi-host sharding: each process sees its slice (SURVEY §5)
        import jax

        n_proc = jax.process_count()
        if n_proc > 1:
            self.ids = self.ids[jax.process_index()::n_proc]

    def __len__(self):
        return len(self.ids)

    def _load_image(self, info) -> np.ndarray:
        import cv2

        path = os.path.join(self.root, self.split, info["file_name"])
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def get_example(self, i: int, rng: np.random.RandomState | None = None,
                    image_size: tuple[int, int] | None = None):
        """One padded example. Returns the Batch fields minus batching.

        ``rng`` drives the augmentation draws; when None the loader's
        stateful rng is used (fine for one-off calls — the step-pure
        ``iter_from`` path always passes a derived rng). ``image_size``
        overrides the padded bucket (multi-bucket pipeline).
        """
        import cv2

        if rng is None:
            rng = self.rng

        cfg = self.cfg
        bh, bw = image_size or cfg.train.image_size
        g = cfg.train.max_gt
        s = cfg.train.gt_mask_size

        img_id = self.ids[i]
        info = self.index.images[img_id]
        anns = [
            a for a in self.index.img_anns[img_id] if not a.get("iscrowd", 0)
        ]
        if self.keypoints:
            anns = [a for a in anns if a.get("num_keypoints", 0) > 0]
        img = self._load_image(info)
        h0, w0 = img.shape[:2]

        # resize: reference prepare (min 600 / max 1000) then clamp into the
        # static bucket.
        scale = min(self.min_size / min(h0, w0), self.max_size / max(h0, w0))
        scale = min(scale, bh / h0, bw / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        with self._waste_lock:
            self._waste_sum += 1.0 - (nh * nw) / float(bh * bw)
            self._waste_n += 1

        do_flip = self.flip and rng.rand() < 0.5
        if do_flip:
            img = img[:, ::-1]

        # uint8 transport: ¼ the bytes of a float canvas, and the
        # astype/÷255 (60% of host decode time on this 1-core box, see
        # tools/bench_loader.py) moves onto the device — MaskRCNN.extract
        # converts uint8→f32/255, numerically identical.
        canvas = np.zeros((bh, bw, 3), np.uint8)
        canvas[:nh, :nw] = img

        boxes = np.zeros((g, 4), np.float32)
        labels = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        masks = np.zeros((g, s, s), np.float32)
        kps = np.zeros((g, self.cfg.model.n_keypoints, 3), np.float32)

        n = 0
        for ann in anns:
            if n >= g:
                break
            x, y, wb, hb = ann["bbox"]
            y0, x0 = y * scale, x * scale
            y1, x1 = (y + hb) * scale, (x + wb) * scale
            # ≥1px fix (reference train.py:28-30)
            y1 = min(max(y1, y0 + 1), nh)
            x1 = min(max(x1, x0 + 1), nw)
            if do_flip:
                x0, x1 = nw - x1, nw - x0
            boxes[n] = [y0, x0, y1, x1]
            labels[n] = self.index.cat_to_contiguous[ann["category_id"]]
            valid[n] = True

            if self.keypoints:
                kp = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
                if do_flip and len(kp) == len(self.kp_flip_perm):
                    # swap left/right joint ROWS, then mirror x below —
                    # mirroring alone mislabels every left joint as right
                    kp = kp[self.kp_flip_perm]
                ky = kp[:, 1] * scale
                kx = kp[:, 0] * scale
                if do_flip:
                    kx = np.where(kp[:, 2] > 0, nw - kx, kx)
                k_count = min(len(kp), kps.shape[1])
                kps[n, :k_count, 0] = ky[:k_count]
                kps[n, :k_count, 1] = kx[:k_count]
                kps[n, :k_count, 2] = kp[:k_count, 2]
            else:
                full = ann_to_mask(ann, h0, w0)
                if do_flip:
                    full = full[:, ::-1]
                    fx0, fx1 = w0 - (x + wb), w0 - x
                else:
                    fx0, fx1 = x, x + wb
                # crop to the (original-res) box, resize to the fixed crop
                cy0, cy1 = int(np.floor(y)), int(np.ceil(y + hb))
                cx0, cx1 = int(np.floor(fx0)), int(np.ceil(fx1))
                cy0, cx0 = max(cy0, 0), max(cx0, 0)
                cy1, cx1 = min(max(cy1, cy0 + 1), h0), min(max(cx1, cx0 + 1), w0)
                crop = full[cy0:cy1, cx0:cx1].astype(np.float32)
                masks[n] = cv2.resize(crop, (s, s),
                                      interpolation=cv2.INTER_LINEAR)
            n += 1

        return dict(
            image=canvas,
            img_hw=np.array([nh, nw], np.float32),
            scale=np.float32(scale),
            gt_boxes=boxes,
            gt_labels=labels,
            gt_valid=valid,
            # uint8 transport of the [0,1] crops (≤1/510 quantization,
            # beneath mask_targets' ≥0.5 threshold); quarters the
            # dominant per-step H2D tensor, like the round-4 uint8 image
            # transport
            gt_masks=(masks * 255.0 + 0.5).astype(np.uint8),
            gt_keypoints=kps,
        )

    def batch(self, indices, rngs=None, image_size=None, pool=None) -> Batch:
        if rngs is None:
            rngs = [None] * len(indices)
        if pool is not None:
            # thread-parallel decode (reference: MultithreadIterator,
            # train.py:124-126) — JPEG decode / cv2.resize / fillPoly
            # release the GIL, so threads scale without fork/spawn hazards
            ex = list(pool.map(
                lambda a: self.get_example(a[0] % len(self.ids), a[1],
                                           image_size),
                zip(indices, rngs),
            ))
        else:
            ex = [self.get_example(i % len(self.ids), rng, image_size)
                  for i, rng in zip(indices, rngs)]
        stack = lambda k: np.stack([e[k] for e in ex])
        return Batch(
            images=stack("image"),
            img_hw=stack("img_hw"),
            scale=np.array([e["scale"] for e in ex], np.float32),
            gt_boxes=stack("gt_boxes"),
            gt_labels=stack("gt_labels"),
            gt_valid=stack("gt_valid"),
            gt_masks=None if self.keypoints else stack("gt_masks"),
            gt_keypoints=stack("gt_keypoints") if self.keypoints else None,
        )

    def _epoch_order(self, epoch: int) -> np.ndarray:
        if self._order_cache is not None and self._order_cache[0] == epoch:
            return self._order_cache[1]
        order = np.arange(len(self.ids))
        np.random.RandomState(
            (self.seed * 100_003 + epoch) % (2**31 - 1)
        ).shuffle(order)
        self._order_cache = (epoch, order)
        return order

    def _example_rng(self, epoch: int, idx: int) -> np.random.RandomState:
        return np.random.RandomState(
            (self.seed * 100_003 + epoch * 131_071 + idx) % (2**31 - 1)
        )

    def bucket_of(self, i: int) -> int:
        """Bucket index minimizing padded waste for image i — computed from
        the annotation index dims only (no image load), so bucket grouping
        can be replayed cheaply when seeking the stream."""
        buckets = self.cfg.train.image_buckets
        info = self.index.images[self.ids[i]]
        h0, w0 = info["height"], info["width"]
        best, best_waste = 0, 2.0
        for k, (bh, bw) in enumerate(buckets):
            scale = min(self.min_size / min(h0, w0),
                        self.max_size / max(h0, w0), bh / h0, bw / w0)
            waste = 1.0 - (h0 * scale) * (w0 * scale) / float(bh * bw)
            if waste < best_waste - 1e-9:
                best, best_waste = k, waste
        return best

    def padding_waste(self) -> float:
        """Mean padded-area fraction over all examples loaded so far."""
        return self._waste_sum / max(1, self._waste_n)

    def iter_from(self, step: int = 0, n_workers: int = 1):
        """Infinite batch stream as a PURE function of the global step.

        Per-epoch shuffles and per-example augmentation draws derive from
        (seed, epoch, image-index) rather than iterator history, so resuming
        at step k replays exactly the batches an uninterrupted run would see
        — the data half of exact restart (the reference loses even
        LR-schedule position on restart, SURVEY §5 "failure detection").

        With ``cfg.train.image_buckets`` set, each image goes to its
        least-waste bucket and batches are emitted per bucket as they fill;
        seeking replays the (image-dims-only) grouping without decoding
        any image.

        ``n_workers > 1`` decodes a batch's examples on a thread pool
        (reference: MultithreadIterator, train.py:124-126) — batch
        composition and every augmentation draw are identical regardless
        of worker count (draws come from per-example rngs).
        """
        pool = None
        if n_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(n_workers)
        buckets = self.cfg.train.image_buckets
        if buckets and len(buckets) > 1:
            yield from self._iter_bucketed(step, pool)
            return
        # a LONE bucket overrides cfg.train.image_size rather than being
        # silently dropped
        image_size = buckets[0] if buckets else None
        b = self.cfg.train.batch_size
        per_epoch = max(1, len(self.ids) // b)
        while True:
            epoch, j = divmod(step, per_epoch)
            order = self._epoch_order(epoch)
            idxs = order.take(np.arange(j * b, (j + 1) * b), mode="wrap")
            rngs = [self._example_rng(epoch, int(i)) for i in idxs]
            yield self.batch(idxs, rngs, image_size=image_size, pool=pool)
            step += 1

    def _iter_bucketed(self, step: int, pool=None):
        b = self.cfg.train.batch_size
        buckets = list(self.cfg.train.image_buckets)
        queues: list[list[tuple[int, int]]] = [[] for _ in buckets]
        produced = 0
        epoch = 0
        while True:
            order = self._epoch_order(epoch)
            for i in order:
                bi = self.bucket_of(int(i))
                queues[bi].append((epoch, int(i)))
                if len(queues[bi]) == b:
                    group, queues[bi] = queues[bi], []
                    if produced >= step:
                        idxs = [g[1] for g in group]
                        rngs = [self._example_rng(e, gi) for e, gi in group]
                        yield self.batch(idxs, rngs, image_size=buckets[bi],
                                         pool=pool)
                    produced += 1
            epoch += 1

    def __iter__(self):
        return self.iter_from(0)
