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
    p.add_argument("--label-file", default=None,
                   help="class-name list for n_fg_class + per-class "
                        "ap/<name> names (reference train.py:92-93); "
                        "COCO datasets default to the annotation categories")
    p.add_argument("--category-filter", default=None,
                   help="comma-separated COCO category names (OR image "
                        "filter, reference coco_dataset.py:30-39)")
    p.add_argument("--out", default=None, help="write report JSON here")
    p.add_argument("--set", action="append", default=[], metavar="SEC.KEY=V",
                   help="config override, e.g. --set eval.mask_levels=refined"
                        " or --set model.kp_upsample=align_corners (A/B runs"
                        " of documented parity divergences)")
    p.add_argument("--dump-results", default=None, metavar="PATH",
                   help="also write a standard COCO results JSON (segm "
                        "format, pycocotools loadRes-compatible) over the "
                        "whole --dataset coco split — score offline with "
                        "real pycocotools to check AP parity")
    args = p.parse_args(argv)

    if args.dump_results and args.dataset != "coco":
        # validate BEFORE the (multi-minute) evaluation runs
        p.error("--dump-results requires --dataset coco "
                "(needs real image ids / category ids)")

    import jax

    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.eval.evaluator import evaluate_dataset
    from maskrcnn_tpu.train import create_train_state, init_model
    from maskrcnn_tpu.train.checkpoint import load_params_only

    cfg = cfg_lib.PRESETS[args.preset]()
    # mirror cli/train.py's default: COCO label names for non-keypoint,
    # non-tiny presets (keeps n_fg_class/report names consistent between
    # default training runs and default evals)
    if args.label_file is None and cfg.model.head != "fpn_keypoint" \
            and args.preset != "tiny_test":
        cand = os.path.join(os.path.dirname(__file__), "..", "data",
                            "label_coco.txt")
        if os.path.exists(cand):
            args.label_file = cand
    cfg = cfg_lib.apply_overrides(cfg, args.set)
    label_names = None
    if args.label_file:
        with open(args.label_file) as f:
            label_names = [ln.strip() for ln in f if ln.strip()]
        cfg = cfg_lib._rep(cfg, model=dict(n_fg_class=len(label_names)))
    model, variables = init_model(cfg, jax.random.key(0))
    state = create_train_state(cfg, variables, jax.random.key(1))
    if args.weight:
        state = load_params_only(args.weight, state)
        print(f"loaded {args.weight}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.dataset == "synthetic":
        from maskrcnn_tpu.data import SyntheticDetectionData

        batches = iter(SyntheticDetectionData(cfg, seed=1))
    else:
        from maskrcnn_tpu.data.coco import COCODetectionLoader

        category_filter = (
            [s.strip() for s in args.category_filter.split(",") if s.strip()]
            if args.category_filter else None
        )
        loader = COCODetectionLoader(args.coco_root, args.coco_split, cfg,
                                     flip=False,
                                     category_filter=category_filter)
        if label_names is None:
            label_names = loader.index.label_names
        batches = iter(loader)

    predict_cache = {}  # shared with the exporter: one compile per bucket
    if cfg.model.head == "fpn_keypoint":
        from maskrcnn_tpu.eval.evaluator import evaluate_keypoint_dataset

        report = evaluate_keypoint_dataset(cfg, model, variables, batches,
                                           args.n_batches,
                                           predict_cache=predict_cache)
    else:
        report = evaluate_dataset(cfg, model, variables, batches,
                                  args.n_batches, label_names,
                                  predict_cache=predict_cache)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)

    if args.dump_results:
        if cfg.model.head == "fpn_keypoint":
            from maskrcnn_tpu.eval.export import export_coco_keypoint_results

            n = export_coco_keypoint_results(cfg, model, variables, loader,
                                             args.dump_results,
                                             predict_cache=predict_cache)
        else:
            from maskrcnn_tpu.eval.export import export_coco_results

            n = export_coco_results(cfg, model, variables, loader,
                                    args.dump_results,
                                    predict_cache=predict_cache)
        print(f"wrote {n} detections to {args.dump_results}")


if __name__ == "__main__":
    main()
