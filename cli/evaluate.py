"""Evaluation CLI — the reference evaluator.py as a standalone command.

Spec: reference evaluator.py:68-104 (VOC mask mAP@0.5 via model.predict over
a val iterator, reporting map + per-class ap/<name>) — plus COCO-style AP
(IoU .50:.95), which the reference lacks (SURVEY §2 #21).

  python cli/evaluate.py --preset tiny_test --weight runs/x/checkpoints/... \
      --dataset synthetic --n-batches 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fpn_mask")
    p.add_argument("--weight", default=None)
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "coco"])
    p.add_argument("--coco-root", default=None)
    p.add_argument("--coco-split", default="val2014")
    p.add_argument("--n-batches", type=int, default=16)
    p.add_argument("--out", default=None, help="write report JSON here")
    args = p.parse_args(argv)

    import jax

    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.eval.evaluator import evaluate_dataset
    from maskrcnn_tpu.train import create_train_state, init_model
    from maskrcnn_tpu.train.checkpoint import load_params_only

    cfg = cfg_lib.PRESETS[args.preset]()
    model, variables = init_model(cfg, jax.random.key(0))
    state = create_train_state(cfg, variables, jax.random.key(1))
    if args.weight:
        state = load_params_only(args.weight, state)
        print(f"loaded {args.weight}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    label_names = None
    if args.dataset == "synthetic":
        from maskrcnn_tpu.data import SyntheticDetectionData

        batches = iter(SyntheticDetectionData(cfg, seed=1))
    else:
        from maskrcnn_tpu.data.coco import COCODetectionLoader

        loader = COCODetectionLoader(args.coco_root, args.coco_split, cfg,
                                     flip=False)
        label_names = loader.index.label_names
        batches = iter(loader)

    if cfg.model.head == "fpn_keypoint":
        from maskrcnn_tpu.eval.evaluator import evaluate_keypoint_dataset

        report = evaluate_keypoint_dataset(cfg, model, variables, batches,
                                           args.n_batches)
    else:
        report = evaluate_dataset(cfg, model, variables, batches,
                                  args.n_batches, label_names)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
