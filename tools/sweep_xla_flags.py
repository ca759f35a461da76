"""XLA:TPU flag sweep over the headline train step.

Convs are ~86 ms of the 157 ms step at ~40% conv-MFU (round-4 profile);
XLA exposes TPU-backend knobs that shift conv/fusion codegen. This sweeps
them via subprocess bench.py runs (one process per flag set — XLA_FLAGS is
read at backend init) and prints one JSON line per variant.

Includes a CANARY (scoped_vmem_limit_kib=1024, absurdly small): if the
canary does NOT regress the step, the compile service ignores client
XLA_FLAGS (this environment compiles remotely over the axon tunnel) and
the sweep is inconclusive — the tool says so rather than printing noise.

Usage: python tools/sweep_xla_flags.py [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "baseline": "",
    "canary_tiny_vmem": "--xla_tpu_scoped_vmem_limit_kib=1024",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_multi_level_fusion": "--xla_tpu_enable_multi_level_nested_loop_fusion=false",
    "license_to_fuse": "--xla_tpu_licm_size_inflation_ratio=1",
}


def run(flags: str, steps: int) -> dict | None:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # flag variants must not poison the shared compilation cache —
        # XLA_FLAGS are not part of jax's persistent-cache key. Give each
        # flagged run its own throwaway dir (the baseline keeps the shared
        # cache and its warm-compile advantage; we compare STEP time, not
        # compile time).
        import tempfile

        env["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix="xla_sweep_cache_")
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--steps", str(steps)],
            capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--only", default=None,
                   help="comma-separated variant names")
    args = p.parse_args()

    names = (args.only.split(",") if args.only else list(VARIANTS))
    results = {}
    for name in names:
        rec = run(VARIANTS[name], args.steps)
        ms = rec.get("step_ms_chained") if rec else None
        results[name] = ms
        print(json.dumps({"variant": name, "flags": VARIANTS[name],
                          "step_ms_chained": ms,
                          "img_s": rec.get("value") if rec else None}),
              flush=True)

    base = results.get("baseline")
    canary = results.get("canary_tiny_vmem")
    if base and canary and canary < base * 1.1:
        print(json.dumps({
            "verdict": "INCONCLUSIVE",
            "reason": "tiny-vmem canary did not regress the step — the "
                      "remote compile service ignores client XLA_FLAGS; "
                      "flag results above are noise",
        }))


if __name__ == "__main__":
    main()
