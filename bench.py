"""Headline benchmark: FPN Mask R-CNN training images/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N/BASELINE}

Baseline anchor (see BASELINE.md): the reference publishes no numbers; its
default config is batch-1 Mask R-CNN FPN/ResNet-50 on an AWS p2.xlarge (K80).
Contemporary measurements of equivalent Chainer/Caffe2 Mask R-CNN put that
class of setup at ~1 image/sec — we anchor vs_baseline at 1.0 img/s and note
the >10x target from BASELINE.json.

Usage: python bench.py [--steps N] [--batch B] [--height H] [--width W]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--preset", default="fpn_mask")
    # bf16 compute (f32 master weights/accumulation) is the standard TPU
    # training regime and this framework's headline configuration.
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--roi-align", default="auto",
                   choices=["auto", "region", "gather", "pallas"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone activations (bigger batches)")
    p.add_argument("--mode", default="train", choices=["train", "predict"],
                   help="train images/sec (default) or two-pass predict p50 latency")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.data import SyntheticDetectionData
    from maskrcnn_tpu.train import create_train_state, init_model, make_train_step

    cfg = cfg_lib.PRESETS[args.preset]()
    cfg = cfg_lib._rep(
        cfg,
        train=dict(batch_size=args.batch, image_size=(args.height, args.width)),
        model=dict(dtype=args.dtype, roi_align=args.roi_align,
                   remat=args.remat),
    )

    model, variables = init_model(cfg, jax.random.key(0))
    data = SyntheticDetectionData(cfg)
    batch = jax.tree.map(jnp.asarray, data.batch(0))

    if args.mode == "predict":
        from maskrcnn_tpu.eval import make_predict_fn

        predict = make_predict_fn(cfg, model)
        det = predict(variables, batch.images, batch.img_hw, batch.scale)
        jax.block_until_ready(det.scores)
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            det = predict(variables, batch.images, batch.img_hw, batch.scale)
            jax.block_until_ready(det.scores)
            times.append(time.perf_counter() - t0)
        times.sort()
        p50 = times[len(times) // 2] * 1000
        print(json.dumps({
            "metric": f"predict_p50_ms_{args.preset}_{args.height}x{args.width}_b{args.batch}",
            "value": round(p50, 2),
            "unit": "ms",
            # reference published no inference latency; anchor 1000 ms
            # (batch-1 two-pass predict on its CPU/K80 era hardware).
            "vs_baseline": round(1000.0 / p50, 3),
        }))
        return

    state = create_train_state(cfg, variables, jax.random.key(1))
    step = make_train_step(cfg, model)

    # compile + warmup
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch * args.steps / dt
    baseline = 1.0  # img/s; see BASELINE.md anchor note
    print(json.dumps({
        "metric": f"train_images_per_sec_{args.preset}_{args.height}x{args.width}_b{args.batch}",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
