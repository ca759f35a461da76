"""Headline benchmark: FPN Mask R-CNN training images/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N/BASELINE, ...}

Baseline anchor (see BASELINE.md): the reference publishes no numbers; its
default config is batch-1 Mask R-CNN FPN/ResNet-50 on an AWS p2.xlarge (K80).
Contemporary measurements of equivalent Chainer/Caffe2 Mask R-CNN put that
class of setup at ~1 image/sec — we anchor vs_baseline at 1.0 img/s and note
the >10x target from BASELINE.json.

SELF-VALIDATION (added after round 1 recorded a physically impossible
3443 img/s under a libtpu client/terminal mismatch): the JSON line now
carries platform/device metadata, per-step p50/p90 ms, the compiled step's
static FLOP count, and the implied model-FLOPs utilization (MFU). The run is
marked ``"suspect": true`` (with a reason) whenever the numbers violate
physics: implied MFU above ~60% of the chip's peak, or a mismatch between
the chained-throughput clock and the per-step clock. Timing is closed by a
device->host transfer of the final loss (``float(...)``) — unlike
``block_until_ready``, a value fetch cannot complete before the compute
that produces it.

Usage: python bench.py [--steps N] [--batch B] [--height H] [--width W]
"""

from __future__ import annotations

import argparse
import json
import time

# bf16 peak matmul FLOP/s per chip, by device_kind substring. Used only for
# the MFU sanity bound — approximate is fine.
_PEAK_FLOPS = [
    ("v6", 918e12),        # Trillium
    ("v5p", 459e12),
    ("v5 lite", 197e12),   # v5e
    ("v5e", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
]

MFU_SUSPECT_BOUND = 0.60  # detection train steps never exceed this
# chained vs per-step clock ratio: measured disagreement on a healthy
# tunnel is 1.15-1.25x (per-step host-sync adds ~20-30 ms of dispatch
# round-trip the chained clock amortizes). 2x flags genuine async-lying
# while passing that overhead band; round 3's 3x would have passed a real
# 2x disagreement (VERDICT round-3 weak #6).
CLOCK_MISMATCH_BOUND = 2.0
SLOW_SUSPECT_FACTOR = 1.5  # measured/expected step-time ratio

# Expected chained ms/step on one healthy v5e for known configs, measured
# round 3 (post window-form revert). LOW-side self-validation: round 2's
# validator only caught impossibly-FAST runs, so a 3x-too-slow regression
# (the 490 ms window-form step) sailed through unflagged. A measured step
# above SLOW_SUSPECT_FACTOR x expected marks the run suspect — either the
# code regressed or the chip/tunnel is degraded; both deserve a flag.
# Keyed by (preset, height, width, batch, dtype, mode).
_EXPECTED_STEP_MS = {
    # fpn_mask carries the reference's full proposal budgets (12000/2000)
    # since round 3; `fast` is the trimmed-budget (2000/1000) variant.
    # round 4: auto routes the region-gather VJP to the Pallas
    # tile-accumulator scatter on a single TPU (fused path, 140.9 ms)
    ("fpn_mask", 800, 1024, 8, "bfloat16", "train"): 141.0,
    ("fast", 800, 1024, 8, "bfloat16", "train"): 150.0,
    ("fpn_mask", 800, 1024, 32, "bfloat16", "train"): 580.0,
    ("fpn_mask", 800, 1024, 8, "float32", "train"): 480.0,
    # predict p50 (two-pass, batch 1) on one healthy v5e
    ("fpn_mask", 800, 1024, 1, "bfloat16", "predict"): 37.0,
    ("light_head", 608, 800, 1, "bfloat16", "predict"): 32.0,
}


def _peak_flops(device_kind: str) -> float | None:
    kind = device_kind.lower()
    for key, peak in _PEAK_FLOPS:
        if key in kind:
            return peak
    return None


def _device_meta():
    import jax

    d = jax.devices()[0]
    return {
        "platform": d.platform,
        "device_kind": d.device_kind,
        "n_devices": len(jax.devices()),
        "jax_version": jax.__version__,
    }


def _static_flops(jitted, *args) -> float | None:
    """Per-invocation FLOPs of the compiled computation, via XLA's own
    cost analysis. None when the backend doesn't expose it."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops")
        return float(flops) if flops and flops > 0 else None
    except Exception:
        return None


def _validate(record: dict, flops: float | None, peak: float | None,
              step_ms_chained: float, step_ms_p50: float,
              expected_ms: float | None = None) -> None:
    """Attach MFU + suspect flags to the record, mutating it."""
    reasons = []
    if expected_ms is not None:
        record["expected_step_ms"] = expected_ms
        if step_ms_chained > SLOW_SUSPECT_FACTOR * expected_ms:
            reasons.append(
                f"chained step {step_ms_chained:.0f} ms exceeds "
                f"{SLOW_SUSPECT_FACTOR}x the expected {expected_ms:.0f} ms "
                "for this config — code regression or degraded chip/tunnel"
            )
    if flops is not None:
        record["step_flops"] = flops
        implied = flops / (step_ms_chained / 1e3)
        record["implied_tflops_per_sec"] = round(implied / 1e12, 2)
        if peak is not None:
            mfu = implied / peak
            record["implied_mfu"] = round(mfu, 4)
            if mfu > MFU_SUSPECT_BOUND:
                reasons.append(
                    f"implied MFU {mfu:.2f} exceeds {MFU_SUSPECT_BOUND} of "
                    f"{peak/1e12:.0f} TFLOP/s peak — physically implausible"
                )
    ratio = step_ms_p50 / max(step_ms_chained, 1e-9)
    if ratio > CLOCK_MISMATCH_BOUND or ratio < 1.0 / CLOCK_MISMATCH_BOUND:
        reasons.append(
            f"chained clock {step_ms_chained:.1f} ms/step disagrees with "
            f"per-step clock p50 {step_ms_p50:.1f} ms by {ratio:.1f}x — "
            "async dispatch may not be flushing"
        )
    if reasons:
        record["suspect"] = True
        record["suspect_reason"] = "; ".join(reasons)


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
                   choices=["auto", "region", "gather", "pallas", "fused"])
    p.add_argument("--roi-align-acc", default="float32",
                   choices=["float32", "bfloat16"],
                   help="fused-path scatter accumulator dtype")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone activations (bigger batches)")
    p.add_argument("--grad-accum", type=int, default=None,
                   help="micro-batch accumulation steps; default: 1 up to "
                        "batch 8, then batch//8 (the single-chip batch-32 "
                        "path at 800x1024 — full batches OOM in the conv "
                        "backward, see BASELINE.md)")
    p.add_argument("--mode", default="train", choices=["train", "predict"],
                   help="train images/sec (default) or two-pass predict p50 latency")
    p.add_argument("--momentum-dtype", default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="SGD momentum buffer dtype (bfloat16 halves "
                        "optimizer HBM traffic)")
    p.add_argument("--stem", default="s2d", choices=["s2d", "direct"],
                   help="ResNet stem form: space-to-depth 4x4/1 (default) "
                        "or the direct 7x7/2 conv (A/B reference)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.data import SyntheticDetectionData
    from maskrcnn_tpu.train import create_train_state, init_model, make_train_step

    grad_accum = args.grad_accum
    if grad_accum is None:
        grad_accum = max(1, args.batch // 8) if args.batch > 8 else 1
    cfg = cfg_lib.PRESETS[args.preset]()
    cfg = cfg_lib._rep(
        cfg,
        train=dict(batch_size=args.batch, image_size=(args.height, args.width),
                   grad_accum_steps=grad_accum,
                   momentum_dtype=args.momentum_dtype),
        model=dict(dtype=args.dtype, roi_align=args.roi_align,
                   roi_align_acc=args.roi_align_acc,
                   remat=args.remat, stem_s2d=args.stem == "s2d"),
    )

    meta = _device_meta()
    peak = _peak_flops(meta["device_kind"])

    model, variables = init_model(cfg, jax.random.key(0))
    data = SyntheticDetectionData(cfg)
    batch = jax.tree.map(jnp.asarray, data.batch(0))

    if args.mode == "predict":
        from maskrcnn_tpu.eval import make_predict_fn

        predict = make_predict_fn(cfg, model)
        det = predict(variables, batch.images, batch.img_hw, batch.scale)
        float(det.scores.sum())  # warmup, forced completion
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            det = predict(variables, batch.images, batch.img_hw, batch.scale)
            float(det.scores.sum())
            times.append(time.perf_counter() - t0)
        times.sort()
        p50 = times[len(times) // 2] * 1000
        p90 = times[min(len(times) - 1, int(len(times) * 0.9))] * 1000
        record = {
            "metric": f"predict_p50_ms_{args.preset}_{args.height}x{args.width}_b{args.batch}",
            "value": round(p50, 2),
            "unit": "ms",
            # reference published no inference latency; anchor 1000 ms
            # (batch-1 two-pass predict on its CPU/K80 era hardware).
            "vs_baseline": round(1000.0 / p50, 3),
            "p90_ms": round(p90, 2),
            **meta,
        }
        expected = _EXPECTED_STEP_MS.get(
            (args.preset, args.height, args.width, args.batch, args.dtype,
             "predict")
        )
        # same LOW-side validation as train mode: a p50 far above the
        # recorded v5e latency means a regression, a degraded tunnel, or a
        # non-TPU platform — all worth a flag on the headline line
        _validate(record, None, None, p50, p50, expected)
        print(json.dumps(record))
        return

    state = create_train_state(cfg, variables, jax.random.key(1))
    step = make_train_step(cfg, model)

    flops = _static_flops(step, state, batch)
    if flops is not None and grad_accum > 1:
        # XLA's cost analysis counts a lax.scan body ONCE (measured: the
        # accum-4 step reports the same flops as accum-1); the micro-batch
        # loop executes it grad_accum times.
        flops *= grad_accum

    # compile + warmup (forced completion via host transfer)
    state, metrics = step(state, batch)
    float(metrics["loss"])

    # clock 1: per-step, host-synced each iteration (immune to async lying)
    per_step = []
    for _ in range(max(5, args.steps // 4)):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        float(metrics["loss"])
        per_step.append(time.perf_counter() - t0)
    per_step.sort()
    p50_ms = per_step[len(per_step) // 2] * 1000
    p90_ms = per_step[min(len(per_step) - 1, int(len(per_step) * 0.9))] * 1000

    # clock 2: chained throughput, one forced transfer at the end (each step
    # consumes the previous state, so the final loss transitively forces all)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    chained_ms = dt / args.steps * 1000

    imgs_per_sec = args.batch * args.steps / dt
    baseline = 1.0  # img/s; see BASELINE.md anchor note
    record = {
        "metric": f"train_images_per_sec_{args.preset}_{args.height}x{args.width}_b{args.batch}",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / baseline, 3),
        "step_ms_chained": round(chained_ms, 2),
        "step_ms_p50": round(p50_ms, 2),
        "step_ms_p90": round(p90_ms, 2),
        "final_loss": round(final_loss, 4),
        **meta,
    }
    expected = _EXPECTED_STEP_MS.get(
        (args.preset, args.height, args.width, args.batch, args.dtype,
         args.mode)
    )
    # grad-accum / roi-align / momentum-dtype variants shift the step cost;
    # only validate the exact recorded configurations.
    if args.grad_accum is not None or args.roi_align != "auto" \
            or args.remat or args.momentum_dtype is not None \
            or args.stem != "s2d" or args.roi_align_acc != "float32":
        expected = None
    _validate(record, flops, peak, chained_ms, p50_ms, expected)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
