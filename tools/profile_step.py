"""Op-level xprof breakdown of the jitted train step (or predict) on TPU.

The reference had no profiling at all (SURVEY §5); round 3 used ad-hoc xprof
captures. This tool makes the op-level breakdown reproducible: it traces a few
steps with ``jax.profiler``, converts the xplane capture with xprof's own
converter, and prints the top-K HLO ops by self time plus a category rollup
(convolution / fusion / all-reduce / ...), which is exactly the evidence the
conv-MFU work needs.

Usage:
  python tools/profile_step.py [--preset fpn_mask] [--batch 8]
      [--height 800] [--width 1024] [--mode train] [--top 25]
      [--keep-dir DIR]   # keep the raw xplane for tensorboard/xprof UI

Requires the xprof pip package (present in this image). Protobuf descriptors
in the bundled _pb2 files predate protobuf 5, so we force the pure-python
implementation before importing it.
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _convert(xplane_dir: str, tool: str):
    from xprof.convert import raw_to_tool_data as r

    paths = sorted(glob.glob(os.path.join(xplane_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {xplane_dir}")
    data, _ = r.xspace_to_tool_data(paths, tool, {})
    return data


def _rows_from_gviz(data) -> tuple[list[str], list[list]]:
    """xprof emits gviz DataTable JSON (possibly wrapped); normalize rows."""
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    obj = json.loads(data)
    if isinstance(obj, list):  # some tools emit [table, ...]
        obj = obj[0]
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    rows = [[(c or {}).get("v") for c in row["c"]] for row in obj["rows"]]
    return cols, rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fpn_mask")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--mode", default="train", choices=["train", "predict"])
    p.add_argument("--steps", type=int, default=3, help="traced steps")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--keep-dir", default=None,
                   help="write the raw profile here instead of a tmpdir")
    p.add_argument("--stem", default="s2d", choices=["s2d", "direct"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.data import SyntheticDetectionData
    from maskrcnn_tpu.train import create_train_state, init_model, make_train_step
    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = cfg_lib.PRESETS[args.preset]()
    cfg = cfg_lib._rep(
        cfg,
        train=dict(batch_size=args.batch,
                   image_size=(args.height, args.width)),
        model=dict(dtype=args.dtype, stem_s2d=args.stem == "s2d"),
    )
    model, variables = init_model(cfg, jax.random.key(0))
    data = SyntheticDetectionData(cfg)
    batch = jax.tree.map(jnp.asarray, data.batch(0))

    if args.mode == "train":
        state = create_train_state(cfg, variables, jax.random.key(1))
        step = make_train_step(cfg, model)
        state, metrics = step(state, batch)  # compile + warmup
        float(metrics["loss"])

        def run_once():
            nonlocal state, metrics
            state, metrics = step(state, batch)
            float(metrics["loss"])
    else:
        from maskrcnn_tpu.eval import make_predict_fn

        predict = make_predict_fn(cfg, model)
        det = predict(variables, batch.images, batch.img_hw, batch.scale)
        float(det.scores.sum())

        def run_once():
            d = predict(variables, batch.images, batch.img_hw, batch.scale)
            float(d.scores.sum())

    out_dir = args.keep_dir or tempfile.mkdtemp(prefix="xprof_step_")
    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        run_once()
    wall_ms = (time.perf_counter() - t0) / args.steps * 1e3
    jax.profiler.stop_trace()
    print(f"traced {args.steps} steps, wall {wall_ms:.1f} ms/step; "
          f"profile in {out_dir}", file=sys.stderr)

    cols, rows = _rows_from_gviz(_convert(out_dir, "hlo_stats"))
    idx = {c: i for i, c in enumerate(cols)}

    def col(row, *names, default=None):
        for n in names:
            if n in idx:
                return row[idx[n]]
        return default

    # normalize: (category, hlo op name, program, self time us, occurrences)
    recs = []
    for row in rows:
        recs.append({
            "category": col(row, "HLO op category", "category"),
            "name": col(row, "HLO op name", "HLO Op Name", "hlo_op_name"),
            "program": col(row, "Program id", "program_id"),
            "self_us": float(col(row, "Total self time (us)",
                                 "total_self_time_us",
                                 "Total self time in us", default=0) or 0),
            "occurrences": col(row, "#Occurrences", "occurrences"),
            "expr": (col(row, "HLO Op expression", "hlo_op_expression",
                         default="") or "")[:160],
        })
    per_step = args.steps
    total_us = sum(r["self_us"] for r in recs)
    print(f"\ndevice total {total_us / per_step / 1e3:.1f} ms/step "
          f"(wall {wall_ms:.1f} ms/step)")

    by_cat = collections.Counter()
    for r in recs:
        by_cat[r["category"]] += r["self_us"]
    print("\n== category rollup (ms/step) ==")
    for cat, us in by_cat.most_common():
        print(f"  {us / per_step / 1e3:9.2f}  {cat}")

    print(f"\n== top {args.top} HLO ops by self time (ms/step) ==")
    recs.sort(key=lambda r: -r["self_us"])
    for r in recs[: args.top]:
        print(f"  {r['self_us'] / per_step / 1e3:8.2f}  [{r['category']}] "
              f"{r['name']}  x{r['occurrences']}")
        if r["expr"]:
            print(f"            {r['expr']}")


if __name__ == "__main__":
    main()
