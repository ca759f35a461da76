"""Training CLI — mirrors the reference's train.py / train_keypoints.py flags.

Spec: reference train.py:62-76 (gpu, lr, out, iteration, weight, label_file,
backbone, head-arch, batch-size...) and train_keypoints.py:73-91 (+
n_mask_convs, min/max size). TPU-native: one flag set for both mask and
keypoint training (the preset selects the head), data parallel over all
visible chips with --data-parallel, full-state checkpoints, JSONL metrics.

Run (synthetic data smoke):
  python cli/train.py --preset tiny_test --iterations 50 --out /tmp/run
Real data:
  python cli/train.py --preset fpn_mask --coco-root /data/coco --out runs/fpn

Mid-run control channel (chainerui CommandsExtension equivalent, reference
train.py:168-169): write JSON to <out>/commands.json; it is consumed at the
next logging boundary and renamed to commands.json.done. Supported keys:
  {"snapshot": true}   take a full-state checkpoint now
  {"eval": true}       run the in-training evaluator now
  {"stop": true}       checkpoint and exit cleanly
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="fpn_mask",
                   choices=["fpn_mask", "parity", "fast", "fpn_keypoint",
                            "light_head", "c4_res5", "darknet_keypoint",
                            "tiny_test"])
    p.add_argument("--out", default="result",
                   help="output dir (reference --out)")
    p.add_argument("--iterations", type=int, default=None,
                   help="training iterations (reference --iteration 200000)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--image-size", default=None,
                   help="HxW static padded size override, e.g. 512x512")
    p.add_argument("--weight", default=None,
                   help="checkpoint path for warm start (reference --weight)")
    p.add_argument("--pretrained-npz", default=None,
                   help="chainer npz to initialize from: a ResNet50Layers "
                        "ImageNet npz (reference ResNet50Layers('auto'), "
                        "feature_pyramid_network.py:22) or a full serialized "
                        "reference model (load_npz(strict=False) semantics, "
                        "reference train.py:99-101)")
    p.add_argument("--resume", action="store_true",
                   help="exact resume from latest checkpoint in --out")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all visible devices")
    p.add_argument("--snapshot-every", type=int, default=5000,
                   help="checkpoint interval (reference: 5000)")
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--eval-every", type=int, default=0,
                   help="run the evaluator every N iterations "
                        "(reference: VOC mAP every 10000; 0 disables)")
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "coco", "depth"])
    p.add_argument("--coco-root", default=None)
    p.add_argument("--coco-split", default="train2014")
    p.add_argument("--eval-split", default=None,
                   help="COCO split for in-training evaluation (reference "
                        "keeps a separate val iterator, train.py:113-115); "
                        "default: a held-out stream for synthetic data, and "
                        "a SEPARATE loader on the training split otherwise "
                        "(beware: that measures training-set fit)")
    p.add_argument("--depth-manifest", default=None,
                   help="txt list of npz files (reference DepthDataset)")
    p.add_argument("--label-file", default=None,
                   help="class-name list, one per line; sets n_fg_class and "
                        "per-class ap/<name> report names (reference "
                        "train.py:92-93 derives n_fg_class from it). "
                        "Default: data/label_coco.txt for COCO-shaped "
                        "presets, none for keypoint/tiny presets")
    p.add_argument("--category-filter", default=None,
                   help="comma-separated COCO category names; keeps images "
                        "containing ANY of them (OR semantics, reference "
                        "coco_dataset.py:30-39)")
    p.add_argument("--buckets", default=None,
                   help="comma-separated HxW static padding buckets, e.g. "
                        "'800x1024,1024x800'; each image goes to its "
                        "least-waste bucket (one compiled step per bucket)")
    p.add_argument("--steps-per-dispatch", type=int, default=None,
                   help="chain K optimizer steps into ONE device dispatch "
                        "(lax.scan over K stacked batches) — amortizes the "
                        "per-dispatch round trip, which dominates on "
                        "tunneled/remote device links. Default: auto "
                        "(largest K<=20 that lands on every log/snapshot/"
                        "eval boundary; 1 under --data-parallel, multi-"
                        "bucket input, or the cpu backend). Semantics are "
                        "exactly K sequential steps; 1 disables")
    p.add_argument("--loader-workers", type=int, default=1,
                   help="decode threads per batch (reference: "
                        "MultithreadIterator n_threads, train.py:124-126); "
                        "tools/bench_loader.py measures the scaling")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 10-20")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--set", action="append", default=[], metavar="SEC.KEY=V",
                   help="config override, e.g. --set model.freeze_bn=False "
                        "(applied after the preset and the flag shortcuts)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from maskrcnn_tpu.data.prefetch import Prefetcher
    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.train import (
        create_train_state,
        init_model,
        lr_schedule,
        make_train_step,
    )
    from maskrcnn_tpu.train.checkpoint import (
        latest_checkpoint,
        load_params_only,
        restore_checkpoint,
        save_checkpoint,
    )
    from maskrcnn_tpu.utils import MetricLogger, trace_context

    cfg = cfg_lib.PRESETS[args.preset]()
    train_over = {}
    if args.iterations is not None:
        train_over["iterations"] = args.iterations
    if args.lr is not None:
        train_over["lr"] = args.lr
    if args.batch_size is not None:
        train_over["batch_size"] = args.batch_size
    if args.image_size:
        h, w = (int(v) for v in args.image_size.split("x"))
        train_over["image_size"] = (h, w)
    if args.buckets:
        train_over["image_buckets"] = tuple(
            tuple(int(v) for v in s.split("x"))
            for s in args.buckets.split(",")
        )
    if train_over:
        cfg = cfg_lib._rep(cfg, train=train_over)
    cfg = cfg_lib.apply_overrides(cfg, args.set)

    # label file → n_fg_class + per-class report names (reference
    # train.py:92-93: n_fg_class = len(open(label_file).readlines())).
    label_file = args.label_file
    if label_file is None and cfg.model.head != "fpn_keypoint" \
            and args.preset != "tiny_test":
        label_file = os.path.join(
            os.path.dirname(__file__), "..", "data", "label_coco.txt")
    label_names = None
    if label_file:
        with open(label_file) as f:
            label_names = [ln.strip() for ln in f if ln.strip()]
        cfg = cfg_lib._rep(cfg, model=dict(n_fg_class=len(label_names)))

    category_filter = (
        [s.strip() for s in args.category_filter.split(",") if s.strip()]
        if args.category_filter else None
    )

    # build the dataset first so the LR schedule can be epoch-aware
    # (reference decays per EPOCH, train.py:140 / train_keypoints.py:158)
    if args.dataset == "synthetic":
        from maskrcnn_tpu.data import SyntheticDetectionData

        data = SyntheticDetectionData(cfg, seed=args.seed)
    elif args.dataset == "depth":
        from maskrcnn_tpu.data.depth import DepthKeypointDataset

        data = DepthKeypointDataset(cfg, args.depth_manifest, seed=args.seed)
    else:
        from maskrcnn_tpu.data.coco import COCODetectionLoader

        data = COCODetectionLoader(
            args.coco_root, args.coco_split, cfg, seed=args.seed,
            category_filter=category_filter,
        )
    try:
        cfg = cfg_lib._rep(cfg, train=dict(epoch_size=len(data)))
    except TypeError:
        pass  # synthetic stream has no length; keep the preset default

    os.makedirs(args.out, exist_ok=True)
    # persist the effective config (chainerui save_args equivalent,
    # reference train.py:168)
    import json

    with open(os.path.join(args.out, "args.json"), "w") as f:
        json.dump(
            {"cli": vars(args), "config": dataclasses.asdict(cfg)}, f,
            indent=2, default=str,
        )

    model, variables = init_model(cfg, jax.random.key(args.seed))
    if args.pretrained_npz:
        from maskrcnn_tpu.utils.convert_chainer import load_pretrained

        variables = load_pretrained(
            variables, args.pretrained_npz,
            backbone=cfg.model.backbone, head=cfg.model.head,
            n_mask_convs=cfg.model.n_mask_convs,
        )
    state = create_train_state(cfg, variables, jax.random.key(args.seed + 1))

    if args.resume:
        path = latest_checkpoint(os.path.join(args.out, "checkpoints"))
        if path:
            state = restore_checkpoint(path, state)
            print(f"resumed from {path} at step {int(state.step)}")
    elif args.weight:
        state = load_params_only(args.weight, state)
        print(f"warm-started params from {args.weight}")
    start = int(state.step)

    # step-pure stream: on resume the loader seeks to the resumed step so
    # the run sees exactly the batches an uninterrupted run would
    try:
        batches = data.iter_from(start, n_workers=args.loader_workers)
    except TypeError:  # synthetic/depth streams take no worker count
        batches = data.iter_from(start)

    # ---- steps-per-dispatch (K): amortize the per-dispatch round trip ----
    # The per-step loop pays one dispatch + H2D round trip per optimizer
    # step; over the tunneled TPU link that overhead measured ~0.85 s of a
    # 1.2 s step (512²b8). Chaining K steps into one lax.scan dispatch
    # divides it by K with EXACTLY-K-sequential-steps semantics
    # (train/step.py make_train_step(chain=K)).
    multi_shape = (
        args.dataset not in ("synthetic", "depth")
        and cfg.train.image_buckets is not None
        and len(cfg.train.image_buckets) > 1
    )
    total_left = cfg.train.iterations - start
    if args.data_parallel or multi_shape or total_left <= 0:
        # DP steps go through the mesh wrapper; multi-bucket batches vary
        # in shape per step — hard constraints, keep K=1
        chain = 1
        if args.steps_per_dispatch and args.steps_per_dispatch > 1:
            print(f"[dispatch] --steps-per-dispatch "
                  f"{args.steps_per_dispatch} ignored "
                  "(data-parallel or multi-bucket run)")
    elif args.steps_per_dispatch is None and jax.default_backend() == "cpu":
        # XLA:CPU lowers convs inside scan off its fast path (see
        # train/step.py) — auto stays per-step; explicit values are honored
        chain = 1
    else:
        g = math.gcd(args.log_every, args.snapshot_every)
        if args.eval_every:
            g = math.gcd(g, args.eval_every)
        g = math.gcd(g, total_left)
        if start:
            g = math.gcd(g, start)
        cap = args.steps_per_dispatch if args.steps_per_dispatch else 20
        chain = next(d for d in range(max(min(cap, g), 1), 0, -1)
                     if g % d == 0)
        if args.steps_per_dispatch and chain != args.steps_per_dispatch:
            print(f"[dispatch] --steps-per-dispatch "
                  f"{args.steps_per_dispatch} does not divide the "
                  f"log/snapshot/eval boundaries; using {chain}")

    def stack_batches(raw):
        return jax.tree.map(lambda *xs: np.stack(xs), *raw)

    # overlap host data prep with device steps (reference
    # MultithreadIterator equivalent); hold a macro-dispatch's worth
    batches = Prefetcher(batches, size=max(2, 2 * chain))

    # one compiled step per (static bucket, chain length) — multi-bucket
    # pipelines keep a small dict; single-bucket configs one entry
    step_cache = {}
    if args.data_parallel:
        from maskrcnn_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            replicate,
            shard_batch,
        )

        mesh = make_mesh()
        state = replicate(state, mesh)

        def step_for(hw, k=1):
            if hw not in step_cache:
                step_cache[hw] = make_parallel_train_step(
                    cfg, model, mesh, image_size=hw
                )
            return step_cache[hw]

        def put(b):
            return shard_batch(b, mesh)
    else:
        def step_for(hw, k=1):
            if (hw, k) not in step_cache:
                step_cache[hw, k] = make_train_step(
                    cfg, model, image_size=hw, chain=k)
            return step_cache[hw, k]

        def put(b):
            return jax.tree.map(
                lambda x: None if x is None else jnp.asarray(x), b
            )

    sched = lr_schedule(cfg)
    # epoch-aware decay footgun (reference semantics, train.py:140): on a
    # small dataset "every 2 epochs" can be a handful of steps — e.g. 600
    # images at b8 decays every 150 steps, reaching lr·1e-4 by step 600.
    # Warn when the run would decay more than 3 times.
    if cfg.train.iterations // cfg.train.lr_decay_period > 3:
        print(f"[lr] WARNING: lr decays ×{cfg.train.lr_decay_factor} every "
              f"{cfg.train.lr_decay_period} steps — "
              f"{cfg.train.iterations // cfg.train.lr_decay_period} decays "
              "over this run (epoch-aware period on a small dataset?). "
              "Override with --set train.lr_decay_every_iters=N.")
    logger = MetricLogger(args.out, print_every=args.log_every)
    ckpt_dir = os.path.join(args.out, "checkpoints")

    def poll_commands():
        """File-based control channel (see module docstring)."""
        path = os.path.join(args.out, "commands.json")
        if not os.path.exists(path):
            return {}
        try:
            with open(path) as f:
                cmds = json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}
        os.replace(path, path + ".done")
        if not isinstance(cmds, dict):
            return {}
        return cmds

    # In-training eval uses a SEPARATE loader instance: iterating the
    # training loader here would race the Prefetcher thread on the loader's
    # epoch-order cache (both mutate it), silently breaking step-pure
    # resume. With --eval-split it is also a genuinely held-out split
    # (reference keeps a distinct val iterator, train.py:113-115).
    _eval_data = None

    def eval_loader():
        nonlocal _eval_data
        if _eval_data is not None:
            return _eval_data
        if args.dataset == "synthetic":
            _eval_data = type(data)(cfg, seed=args.seed + 999)
        elif args.dataset == "depth":
            from maskrcnn_tpu.data.depth import DepthKeypointDataset

            _eval_data = DepthKeypointDataset(
                cfg, args.depth_manifest, seed=args.seed + 999)
        else:
            from maskrcnn_tpu.data.coco import COCODetectionLoader

            if args.eval_split is None:
                print("[eval] note: no --eval-split; evaluating a separate "
                      "loader on the TRAINING split (training-set fit)")
            _eval_data = COCODetectionLoader(
                args.coco_root, args.eval_split or args.coco_split, cfg,
                seed=args.seed + 999, flip=False,
                category_filter=category_filter,
            )
        return _eval_data

    def run_eval(step_i):
        # in-training evaluation (reference evaluator extension,
        # train.py:164-166) — mask or keypoint metric by head type.
        variables_now = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
        eval_batches = iter(eval_loader())
        if cfg.model.head == "fpn_keypoint":
            from maskrcnn_tpu.eval.evaluator import evaluate_keypoint_dataset

            rep = evaluate_keypoint_dataset(
                cfg, model, variables_now, eval_batches, args.eval_batches)
        else:
            from maskrcnn_tpu.eval.evaluator import evaluate_dataset

            rep = evaluate_dataset(
                cfg, model, variables_now, eval_batches, args.eval_batches,
                label_names=label_names)
        print(f"[eval @{step_i}] " + " ".join(
            f"{k}={v:.4f}" for k, v in rep.items()
            if isinstance(v, float) and "/" not in k or k.startswith("coco")
        ))
        # eval results go to the JSONL, not just stdout (round-4 lesson:
        # the 0.0-AP flagship run was invisible in its own log)
        logger.log_validation(step_i, rep)
        aps = [v for k, v in rep.items()
               if isinstance(v, (int, float)) and "/" not in k]
        if aps and max(aps) == 0.0 and step_i >= 1000:
            print(f"[eval @{step_i}] *** WARNING: every eval metric is 0.0 "
                  "after 1000+ steps — the model is training blind. Check "
                  "the gradient path (tools/diag_fused_grad.py), the "
                  "predict path on a known-good checkpoint, and the data. "
                  "(Reference halts into pdb on numeric warnings, "
                  "train.py:171-176; this is the AP-flavored trap.) ***")
        return rep

    if chain > 1:
        print(f"[dispatch] chaining {chain} steps per device dispatch")
    # fetch cadence (macro steps): keeps the ~20-step async-dispatch bound
    sync_every = max(1, 20 // chain) * chain
    profiling = 0  # 0=armed, 1=tracing, 2=done
    it = start
    while it < cfg.train.iterations:
        if chain > 1:
            batch = put(stack_batches([next(batches) for _ in range(chain)]))
            hw = tuple(batch.images.shape[2:4])
        else:
            batch = put(next(batches))
            hw = tuple(batch.images.shape[1:3])
        if args.profile_dir and profiling == 0 and it - start >= 10:
            jax.profiler.start_trace(args.profile_dir)
            profiling = 1
        state, metrics = step_for(hw, chain)(state, batch)
        step_i = it + chain
        if args.profile_dir and profiling == 1 and step_i - start >= 20:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            profiling = 2
        if step_i % sync_every == 0:
            # bound async dispatch: without a periodic HOST sync the loop
            # enqueues batches faster than the device+tunnel drain them and
            # host transfer buffers accumulate without bound — measured
            # ~13 GB per 1000 steps at 512²b8 on the axon tunnel, OOM-killed
            # at 128 GB mid-quality-run. A value fetch (block_until_ready
            # does not reliably block over this tunnel) every ~20 steps caps
            # the in-flight queue at ~1 GB for ~1% step-time cost. (The
            # reference had the HOST-side version of this bug: its README
            # documents memory growing through the first epoch, needing a
            # 64 GB machine.)
            losses = np.asarray(metrics["loss"]).reshape(-1)  # (chain,)|(1,)
            loss_now = float(losses[-1])
            if not np.isfinite(losses).all():
                # the reference's np.seterr + pdb-on-warning trap
                # (train.py:171-176), TPU-shaped: the loss is fetched here
                # anyway, so finiteness costs nothing. Dump state for the
                # post-mortem and halt instead of training on garbage.
                bad = step_i - len(losses) + 1 + int(
                    np.argmin(np.isfinite(losses)))
                path = save_checkpoint(ckpt_dir, state, step_i)
                parts = {k: np.asarray(v).reshape(-1).tolist()
                         for k, v in metrics.items()}
                raise SystemExit(
                    f"[trap] non-finite loss at step {bad} "
                    f"(macro ending {step_i}); breakdown {parts}; "
                    f"state dumped to {path}"
                )
        if step_i % args.log_every == 0 or step_i == chain:
            # with chaining, log the macro's LAST step (parity with the
            # per-step loop's instantaneous metrics)
            scalars = {k: float(np.asarray(v).reshape(-1)[-1])
                       for k, v in metrics.items()}
            if hasattr(data, "padding_waste"):
                scalars["padding_waste"] = data.padding_waste()
            # input-bound diagnostic: fraction of batch fetches that found
            # the prefetch queue empty (≈1.0 ⇒ the host pipeline is the
            # bottleneck; raise --loader-workers)
            scalars["prefetch_starved"] = (
                batches.starved / max(batches.served, 1))
            logger.log(step_i, scalars,
                       n_images=cfg.train.batch_size * args.log_every,
                       lr=float(sched(step_i)))
        if step_i % args.snapshot_every == 0 or step_i == cfg.train.iterations:
            path = save_checkpoint(ckpt_dir, state, step_i)
            print(f"saved {path}")
        if args.eval_every and step_i % args.eval_every == 0:
            run_eval(step_i)
        if step_i % args.log_every == 0:
            cmds = poll_commands()
            if cmds.get("snapshot"):
                print(f"[commands] snapshot at {step_i}: "
                      f"{save_checkpoint(ckpt_dir, state, step_i)}")
            if cmds.get("eval"):
                run_eval(step_i)
            if cmds.get("stop"):
                print(f"[commands] stop at {step_i}")
                save_checkpoint(ckpt_dir, state, step_i)
                break
        it = step_i
    logger.close()


if __name__ == "__main__":
    main()
