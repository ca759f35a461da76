"""Probe, don't assume: is this TPU's libtpu gather emitter healthy?

Round 2 isolated a reproducible libtpu fault ("TPU worker process
crashed") triggered when several gather lowerings fuse into ONE
executable — minimal repro: two fused ``take_along_axis`` on
(8, 79, 300, ·) operands. ``eval/predict.py`` carries a gather-free
4-stage workaround; through round 3 it was the unconditional default on
every TPU (gated only by the ``MASKRCNN_HEALTHY_TPU`` env var), which
taxes healthy platforms with 3 extra dispatches.

This module runs the minimal repro ONCE per (jax, jaxlib, device kind)
fingerprint — in a SUBPROCESS, because the failure mode kills the host
process — and caches the verdict on disk. The axon TPU tunnel in this
environment multiplexes processes, so the probe can run while the parent
holds the chip; on exclusive-attach platforms the probe fails to
initialize and we conservatively report unhealthy (the workaround path is
always correct, just slower).

Override order: ``MASKRCNN_HEALTHY_TPU`` env var (``1``/``0``) >
cached probe verdict > fresh probe.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_PROBE_TIMEOUT_S = 240  # TPU init + one tiny compile; generous for tunnels

# The failing regime: two take_along_axis lowerings fused into one
# executable on (8, 79, 300, ·) operands (see BASELINE.md round 2).
_PROBE_SRC = r"""
import jax, jax.numpy as jnp

def f(scores, idx, boxes):
    kept = jnp.take_along_axis(scores, idx, axis=2)        # (8,79,300)
    keptb = jnp.take_along_axis(
        boxes, idx[..., None].repeat(4, -1), axis=2)       # (8,79,300,4)
    return kept.sum() + keptb.sum()

scores = jnp.ones((8, 79, 300), jnp.float32)
idx = jnp.zeros((8, 79, 300), jnp.int32)
boxes = jnp.ones((8, 79, 300, 4), jnp.float32)
out = jax.jit(f)(scores, idx, boxes)
assert float(out) == float(out)  # force completion
print("GATHER_PROBE_OK")
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
    return os.path.join(base, "maskrcnn_tpu", f"gather_probe_{_fingerprint()}.json")


def _run_probe() -> bool:
    env = dict(os.environ)
    env.pop("MASKRCNN_HEALTHY_TPU", None)
    # Pin the subprocess to the PARENT's actual backend (round-4 VERDICT:
    # with JAX_PLATFORMS=axon inherited but the axon plugin unavailable in
    # a clean env, the subprocess died at backend init and the probe
    # reported "unhealthy" for a healthy platform). The parent has already
    # initialized jax by the time the probe is wanted, so its resolved
    # platform — not the env var — is the truth.
    try:
        import jax

        backend = jax.default_backend()
        env["JAX_PLATFORMS"] = backend
        if backend == "cpu":
            # A CPU-pinned probe must not pay for foreign-platform
            # bootstraps: a PYTHONPATH sitecustomize that registers a
            # device PJRT plugin initializes it at interpreter startup,
            # and that init can stall arbitrarily behind a busy device
            # tunnel (observed: 66 s best case, > probe timeout while the
            # chip compiles elsewhere). Drop sitecustomize-bearing
            # PYTHONPATH entries; the cpu backend needs none of them.
            kept = [
                p
                for p in env.get("PYTHONPATH", "").split(os.pathsep)
                if p and not os.path.exists(os.path.join(p, "sitecustomize.py"))
            ]
            if kept:
                env["PYTHONPATH"] = os.pathsep.join(kept)
            else:
                env.pop("PYTHONPATH", None)
    except Exception:
        pass
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=_PROBE_TIMEOUT_S,
            env=env,
        )
    except (subprocess.TimeoutExpired, OSError):
        return False
    return proc.returncode == 0 and "GATHER_PROBE_OK" in proc.stdout


def tpu_gather_healthy() -> bool:
    """True when fused gathers compile and run on this TPU (cached)."""
    path = _cache_path()
    try:
        with open(path) as f:
            return bool(json.load(f)["healthy"])
    except Exception:
        pass
    healthy = _run_probe()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"healthy": healthy}, f)
        os.replace(tmp, path)
    except OSError:
        pass
    return healthy


if __name__ == "__main__":
    v = tpu_gather_healthy()
    print(json.dumps({"healthy": v, "cache": _cache_path()}))
