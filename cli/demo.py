"""Render detection/mask overlays from a checkpoint — qualitative results.

The reference ships committed result images (imgs/008.jpg etc.,
README.md:10-30); this produces the same kind of artifact from any
checkpoint: runs the two-pass predict on synthetic or provided images and
writes box+mask overlays.

  python cli/demo.py --preset tiny_test --weight runs/x/checkpoints/... \
      --n 4 --out demo_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="tiny_test")
    p.add_argument("--weight", required=True)
    p.add_argument("--n", type=int, default=4, help="number of images")
    p.add_argument("--out", default="demo_out")
    p.add_argument("--score-thresh", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.data import SyntheticDetectionData
    from maskrcnn_tpu.eval import make_predict_fn
    from maskrcnn_tpu.eval.postprocess import paste_masks
    from maskrcnn_tpu.train import create_train_state, init_model
    from maskrcnn_tpu.train.checkpoint import load_params_only
    from maskrcnn_tpu.utils.vis import vis_detections

    cfg = cfg_lib.PRESETS[args.preset]()
    model, variables = init_model(cfg, jax.random.key(0))
    state = load_params_only(
        args.weight, create_train_state(cfg, variables, jax.random.key(1))
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = make_predict_fn(cfg, model)

    os.makedirs(args.out, exist_ok=True)
    data = SyntheticDetectionData(cfg, seed=args.seed)
    done = 0
    for bi in range(8):
        batch = data.batch(bi)
        det = jax.device_get(predict(
            variables, jnp.asarray(batch.images),
            jnp.asarray(batch.img_hw), jnp.asarray(batch.scale)))
        for i in range(batch.images.shape[0]):
            if done >= args.n:
                break
            hw = (int(batch.img_hw[i][0]), int(batch.img_hw[i][1]))
            keep = det.valid[i] & (det.scores[i] >= args.score_thresh)
            masks = paste_masks(det.boxes[i], det.masks[i], keep, hw)
            img = np.asarray(batch.images[i][: hw[0], : hw[1]])
            if img.dtype != np.uint8:  # loaders may ship f32 or uint8
                img = (img * 255).astype(np.uint8)
            img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
            canvas = vis_detections(
                img, det.boxes[i][keep], det.labels[i][keep],
                det.scores[i][keep], masks, thresh=0.0,
            )
            path = os.path.join(args.out, f"demo_{done:03d}.png")
            cv2.imwrite(path, canvas)
            print(f"{path}: {int(keep.sum())} detections")
            done += 1
        if done >= args.n:
            break


if __name__ == "__main__":
    main()
