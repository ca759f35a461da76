"""On-chip numerics gate for the fused Pallas ROIAlign backward.

Interpret-mode tests (tests/test_kernels.py) exercise the kernel's MATH on
CPU; they are not evidence about real Mosaic lowering — the v1 ROIAlign
kernel's history shows on-chip behavior diverging from interpret mode
(BASELINE.md round 3), and the round-4 flagship run trained on the fused
backward with no on-chip verification at all (round-4 VERDICT #2). This
module runs the fused pair (fwd + bwd) against the XLA region path ON THE
DEVICE, once per (jax, jaxlib, device kind) fingerprint — in a subprocess,
so a Mosaic miscompile or crash cannot take down the training process —
and caches the measured max relative L2 alongside the verdict.

``roi_align="auto"`` refuses the fused kernel until this gate has passed
once on the current fingerprint (models/maskrcnn.py); ``"fused"`` forces
it regardless (the explicit A/B escape hatch).

Override order: ``MASKRCNN_FUSED_OK`` env var (``1``/``0``) > cached
verdict > fresh probe.

Thresholds: with float32 features the fused backward differs from XLA's
scatter only in accumulation order (≤1e-5 rel observed); with bfloat16
features the cotangent einsums round to bf16 per term, so a few 1e-3 rel
is healthy. Gate: f32 ≤ 1e-3, bf16 ≤ 3e-2 — an on-chip miscompile (wrong
offsets, dropped tiles) produces O(1) relative error, orders of magnitude
past either bound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_PROBE_TIMEOUT_S = 900  # two small compiles over a (possibly slow) tunnel

_PROBE_SRC = r"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from maskrcnn_tpu.ops.roi_align import (
    _mlra_region_pair,
    _mlra_region_pair_fused,
)


def rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def run_case(dtype):
    rng = np.random.RandomState(0)
    b, n, n_pos, c = 2, 64, 16, 256
    shapes = np.array([[16, 16], [8, 8]], np.int32)
    sizes = shapes[:, 0].astype(np.int64) * shapes[:, 1]
    offsets = np.concatenate([[0], np.cumsum(sizes * b)[:-1]])
    s_total = int((sizes * b).sum())
    flat = rng.randn(s_total, c).astype(dtype)
    y0 = rng.uniform(0, 60, (b, n)).astype(np.float32)
    x0 = rng.uniform(0, 60, (b, n)).astype(np.float32)
    hh = rng.uniform(16, 60, (b, n)).astype(np.float32)
    ww = rng.uniform(16, 60, (b, n)).astype(np.float32)
    rois = np.stack([y0, x0, y0 + hh, x0 + ww], axis=-1)
    lvls = rng.randint(0, 2, (b, n)).astype(np.int32)
    scales = (1 / 8.0, 1 / 16.0)

    def loss_region(f):
        pb, pm = _mlra_region_pair(
            f, shapes, offsets, jnp.asarray(rois), jnp.asarray(lvls),
            n_pos, (7, 7), (14, 14), scales, 2, 20, 8)
        return ((pb.astype(jnp.float32) ** 2).sum()
                + (pm.astype(jnp.float32) ** 2).sum()), (pb, pm)

    def loss_fused(f):
        pb, pm = _mlra_region_pair_fused(
            f, shapes, offsets, jnp.asarray(rois), jnp.asarray(lvls),
            n_pos, (7, 7), (14, 14), scales, 2, 20, 8,
            interpret=jax.default_backend() != "tpu")
        return ((pb.astype(jnp.float32) ** 2).sum()
                + (pm.astype(jnp.float32) ** 2).sum()), (pb, pm)

    fj = jnp.asarray(flat)
    (_, (pb_r, pm_r)), g_r = jax.jit(
        jax.value_and_grad(loss_region, has_aux=True))(fj)
    (_, (pb_f, pm_f)), g_f = jax.jit(
        jax.value_and_grad(loss_fused, has_aux=True))(fj)
    return {
        "fwd_box": rel_l2(pb_f, pb_r),
        "fwd_mask": rel_l2(pm_f, pm_r),
        "bwd": rel_l2(g_f, g_r),
    }


out = {"f32": run_case(np.float32), "bf16": run_case(jnp.bfloat16)}
ok = (out["f32"]["bwd"] <= 1e-3 and out["f32"]["fwd_box"] <= 1e-5
      and out["bf16"]["bwd"] <= 3e-2)
print("FUSED_GATE " + json.dumps({"ok": ok, "diffs": out}))
"""


def _fingerprint() -> str:
    import jax
    import jaxlib

    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    return f"jax{jax.__version__}-jaxlib{jaxlib.__version__}-{kind}".replace(
        " ", "_"
    ).replace("/", "_")


def _cache_path() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return os.path.join(
        base, "maskrcnn_tpu", f"fused_gate_{_fingerprint()}.json")


def _run_probe() -> dict:
    env = dict(os.environ)
    env.pop("MASKRCNN_FUSED_OK", None)
    try:
        import jax

        env["JAX_PLATFORMS"] = jax.default_backend()
    except Exception:
        pass
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True,
            timeout=_PROBE_TIMEOUT_S, env=env,
        )
    except (subprocess.TimeoutExpired, OSError) as e:
        return {"ok": False, "error": type(e).__name__}
    for line in proc.stdout.splitlines():
        if line.startswith("FUSED_GATE "):
            return json.loads(line[len("FUSED_GATE "):])
    return {"ok": False, "error": f"rc={proc.returncode}",
            "stderr_tail": proc.stderr[-500:]}


def fused_kernel_verified() -> bool:
    """True when the fused pair matched the XLA path on THIS device kind
    (cached once per fingerprint; env MASKRCNN_FUSED_OK overrides)."""
    env = os.environ.get("MASKRCNN_FUSED_OK")
    if env is not None:
        return env == "1"
    path = _cache_path()
    try:
        with open(path) as f:
            return bool(json.load(f)["ok"])
    except Exception:
        pass
    verdict = _run_probe()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(verdict, f, indent=1)
        os.replace(tmp, path)
    except OSError:
        pass
    if not verdict.get("ok"):
        print(f"[kernel_gate] fused ROIAlign backward FAILED the on-chip "
              f"numerics gate ({verdict}); roi_align='auto' stays on the "
              "XLA scatter. --roi-align fused forces it.")
    return bool(verdict.get("ok"))


if __name__ == "__main__":
    # force a fresh probe and print the verdict + cache location
    v = _run_probe()
    path = _cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(v, f, indent=1)
    print(json.dumps({"verdict": v, "cache": path}, indent=1))
