"""AOT-warm the persistent XLA compile cache for a config's train step.

This environment compiles REMOTELY (PALLAS_AXON_REMOTE_COMPILE=1) and a
512² fpn train step costs 15-25 min; the compile server is separate from
the chip, so warming the cache can overlap someone else's training run.
``jit(step).lower(state_sds, batch_sds).compile()`` never executes on
device — state/batch shapes come from ``jax.eval_shape`` over the real
init and a HOST-side loader batch, so the cached executable's HLO is
bit-identical to what the training CLI will request (same shapes,
dtypes, donation, config constants).

  python tools/precompile.py --preset fpn_mask --image-size 640x640 \
      --batch-size 8 --chain 20 --set model.freeze_bn=False \
      --dataset coco --coco-root /tmp/cocosynth

Cites: reference has no analog (chainer is define-by-run); this is
XLA-model-native plumbing (SURVEY §5 config/flag system).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fpn_mask")
    p.add_argument("--image-size", default=None, help="HxW")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--chain", type=int, default=1,
                   help="steps-per-dispatch the run will use")
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "coco"])
    p.add_argument("--coco-root", default=None)
    p.add_argument("--coco-split", default="train")
    p.add_argument("--label-file", default=None)
    p.add_argument("--set", action="append", default=[],
                   metavar="SEC.KEY=V")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.models.maskrcnn import MaskRCNN
    from maskrcnn_tpu.train import create_train_state, make_train_step
    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = cfg_lib.PRESETS[args.preset]()
    over = {}
    if args.image_size:
        h, w = (int(v) for v in args.image_size.split("x"))
        over["image_size"] = (h, w)
    if args.batch_size:
        over["batch_size"] = args.batch_size
    if over:
        cfg = cfg_lib._rep(cfg, train=over)
    cfg = cfg_lib.apply_overrides(cfg, args.set)
    if args.label_file:
        with open(args.label_file) as f:
            n = len([ln for ln in f if ln.strip()])
        cfg = cfg_lib._rep(cfg, model=dict(n_fg_class=n))
    elif args.dataset == "coco":
        # mirror cli/train.py's default: COCO-shaped presets read the
        # bundled label file unless told otherwise
        if args.coco_root:
            lf = os.path.join(args.coco_root, "labels.txt")
            if os.path.exists(lf):
                with open(lf) as f:
                    n = len([ln for ln in f if ln.strip()])
                cfg = cfg_lib._rep(cfg, model=dict(n_fg_class=n))

    hw = tuple(cfg.train.image_size)
    model = MaskRCNN(cfg)

    # ---- state avals without touching the device ----
    def build_state(key):
        variables = model.init(
            key, jnp.zeros((cfg.train.batch_size, *hw, 3), jnp.float32),
            method=MaskRCNN.init_forward)
        return create_train_state(cfg, variables, key)

    state_sds = jax.eval_shape(build_state, jax.random.key(0))

    # ---- batch avals from a real HOST-side loader batch ----
    if args.dataset == "synthetic":
        from maskrcnn_tpu.data import SyntheticDetectionData

        host_batch = SyntheticDetectionData(cfg).batch(0)
    else:
        from maskrcnn_tpu.data.coco import COCODetectionLoader

        loader = COCODetectionLoader(args.coco_root, args.coco_split, cfg)
        host_batch = loader.batch(list(range(cfg.train.batch_size)))

    def to_sds(x):
        if x is None:
            return None
        shape = ((args.chain, *x.shape) if args.chain > 1 else x.shape)
        return jax.ShapeDtypeStruct(shape, x.dtype)

    batch_sds = jax.tree.map(to_sds, host_batch)

    step = make_train_step(cfg, model, image_size=hw, chain=args.chain)
    t0 = time.time()
    lowered = step.lower(state_sds, batch_sds)
    print(f"[precompile] lowered in {time.time() - t0:.1f}s; compiling "
          f"(preset={args.preset} hw={hw} b={cfg.train.batch_size} "
          f"chain={args.chain}) ...", flush=True)
    t0 = time.time()
    lowered.compile()
    print(f"[precompile] compiled + cached in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
