"""Host input-pipeline throughput: can the loader feed the chip?

The device train step consumes ~50 img/s at 800×1024 b8 (BASELINE.md round
3); everything bench.py measures starts AFTER the batch is on device. This
tool times the actual host pipeline — JPEG decode, polygon rasterization,
resize, padding, batch assembly — on a generated real-schema COCO dataset
(realistic image sizes + per-instance polygons), for 1..N decode threads,
and prints one JSON line per worker count:

  python tools/bench_loader.py [--images 256] [--size 640x480]
      [--objects 8] [--batches 20] [--workers 1,2,4,8]

Answers VERDICT round-3 #3: whether real-data training is device-bound or
host-bound, and how many `--loader-workers` the train CLI needs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_images: int, hw: tuple[int, int],
                 n_objects: int, n_classes: int = 20, seed: int = 0,
                 quality: int = 90, mixed_aspect: bool = False,
                 split: str = "train", learnable: bool = False) -> None:
    """Real-schema COCO dir: JPEG images + instances json with polygons.

    ``mixed_aspect`` alternates landscape/portrait (image i odd →
    transposed dims) — drives the multi-bucket pipeline end-to-end.

    ``learnable`` renders class-colored filled shapes (the same
    class→color hash as data/synthetic.py) on a dark background instead of
    pure noise, with the polygon tracing the actual shape — so a model
    trained THROUGH the real host pipeline (JPEG decode, polygon raster,
    resize, padding) can reach nonzero AP: the round-5 full-dress
    rehearsal (VERDICT round-4 #6)."""
    import cv2

    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, split), exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        h0, w0 = hw
        if mixed_aspect and i % 2:
            h0, w0 = w0, h0
        if learnable:
            img = rng.randint(0, 38, (h0, w0, 3)).astype(np.uint8)
        else:
            img = rng.randint(0, 255, (h0, w0, 3)).astype(np.uint8)
        name = f"{i:08d}.jpg"
        img_anns = []
        n_obj = int(rng.randint(1, n_objects + 1)) if learnable else n_objects
        for _ in range(n_obj):
            w = float(rng.uniform(w0 * 0.12, w0 * 0.5))
            hh = float(rng.uniform(h0 * 0.12, h0 * 0.5))
            x = float(rng.uniform(0, w0 - w))
            y = float(rng.uniform(0, h0 - hh))
            cls = int(rng.randint(1, n_classes + 1))
            # an octagon-ish polygon inside the box (realistic vertex count)
            ang = np.sort(rng.uniform(0, 2 * np.pi, 12))
            px = x + w / 2 + (w / 2) * 0.9 * np.cos(ang)
            py = y + hh / 2 + (hh / 2) * 0.9 * np.sin(ang)
            if learnable:
                # class-keyed color, same hash as data/synthetic.py — the
                # classification signal the head must learn
                c0 = cls - 1
                base = np.array([
                    ((c0 * 2654435761) % 255) / 255.0,
                    ((c0 * 40503 + 89) % 255) / 255.0,
                    ((c0 * 9176 + 191) % 255) / 255.0,
                ])
                color = np.clip(
                    0.35 + 0.6 * base + rng.uniform(-0.05, 0.05, 3), 0, 1)
                bgr = tuple(int(v) for v in (color * 255)[::-1])
                pts = np.stack([px, py], 1).astype(np.int32)
                cv2.fillPoly(img, [pts], bgr)
                # tight polygon bbox (annToMask parity for eval)
                x, y = float(px.min()), float(py.min())
                w, hh = float(px.max() - x), float(py.max() - y)
            poly = np.stack([px, py], 1).reshape(-1).tolist()
            img_anns.append({
                "id": aid, "image_id": i + 1,
                "category_id": cls,
                "bbox": [x, y, w, hh], "area": w * hh, "iscrowd": 0,
                "segmentation": [poly],
            })
            aid += 1
        cv2.imwrite(os.path.join(root, split, name), img,
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
        images.append({"id": i + 1, "file_name": name,
                       "height": h0, "width": w0})
        annotations.extend(img_anns)
    cats = [{"id": c, "name": f"class{c}"} for c in range(1, n_classes + 1)]
    with open(os.path.join(root, "annotations",
                           f"instances_{split}.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": cats}, f)
    # label list for the train/eval CLIs' --label-file (n_fg_class)
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write("\n".join(f"class{c}" for c in range(1, n_classes + 1)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--size", default="640x480")
    p.add_argument("--objects", type=int, default=8)
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--image-size", default="800x1024",
                   help="padded device bucket HxW")
    p.add_argument("--workers", default="1,2,4,8")
    p.add_argument("--root", default=None,
                   help="reuse an existing generated dataset dir")
    args = p.parse_args()

    h0, w0 = (int(v) for v in args.size.split("x"))
    bh, bw = (int(v) for v in args.image_size.split("x"))

    root = args.root or tempfile.mkdtemp(prefix="coco_loaderbench_")
    marker = os.path.join(root, ".generated")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        make_dataset(root, args.images, (h0, w0), args.objects)
        open(marker, "w").close()
        print(f"generated {args.images} images in "
              f"{time.perf_counter() - t0:.1f}s at {root}", file=sys.stderr)

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.data.coco import COCODetectionLoader

    cfg = cfg_lib._rep(
        cfg_lib.fpn_mask(),
        train=dict(batch_size=args.batch_size, image_size=(bh, bw)),
    )
    for n_workers in (int(w) for w in args.workers.split(",")):
        loader = COCODetectionLoader(root, "train", cfg, keypoints=False)
        it = loader.iter_from(0, n_workers=n_workers)
        next(it)  # warm caches (annotation index touch, cv2 init)
        t0 = time.perf_counter()
        for _ in range(args.batches):
            next(it)
        dt = time.perf_counter() - t0
        imgs = args.batches * args.batch_size
        print(json.dumps({
            "metric": "host_loader_images_per_sec",
            "value": round(imgs / dt, 2),
            "unit": "img/s",
            "n_workers": n_workers,
            "batch_ms": round(dt / args.batches * 1e3, 1),
            "src_size": f"{h0}x{w0}",
            "bucket": f"{bh}x{bw}",
            "objects_per_image": args.objects,
        }))


if __name__ == "__main__":
    main()
