"""On-chip gradient A/B: XLA region ROIAlign backward vs fused Pallas scatter.

Round-5 diagnostic for the flagship 0.0-AP failure (VERDICT r4 #1): the
flagship run trained with roi_align="auto" which resolved to the fused
Pallas tile-accumulator scatter backward on TPU; its numerics were only
ever asserted in interpret mode on CPU. This script runs ONE train step of
the exact flagship config under both paths from identical state on the real
chip and reports per-module relative L2 of the parameter updates.

Usage: python tools/diag_fused_grad.py [--preset fpn_mask] [--image-size 512x512]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def tree_group_rel(a, b):
    """Per-top-level-module relative L2 between two param trees."""
    flat_a = jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = jax.tree.leaves(b)
    groups = {}
    for (path, la), lb in zip(flat_a, flat_b):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        d, n = groups.setdefault(top, [0.0, 0.0])
        groups[top][0] = d + float(jnp.sum((la.astype(jnp.float32) - lb.astype(jnp.float32)) ** 2))
        groups[top][1] = n + float(jnp.sum(lb.astype(jnp.float32) ** 2))
    return {k: (v[0] ** 0.5) / max(v[1] ** 0.5, 1e-12) for k, v in groups.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="fpn_mask")
    p.add_argument("--image-size", default="512x512")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=1)
    args = p.parse_args()

    from maskrcnn_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from maskrcnn_tpu import config as cfg_lib
    from maskrcnn_tpu.data import SyntheticDetectionData
    from maskrcnn_tpu.train.state import create_train_state
    from maskrcnn_tpu.train.step import init_model, make_train_step

    h, w = (int(x) for x in args.image_size.split("x"))

    import dataclasses

    def build(roi_align):
        cfg = cfg_lib.PRESETS[args.preset]()
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, roi_align=roi_align),
            train=dataclasses.replace(
                cfg.train, image_size=(h, w), image_buckets=None,
                batch_size=args.batch,
            ),
        )
        model, variables = init_model(cfg, jax.random.key(0))
        state = create_train_state(cfg, variables, jax.random.key(1))
        step = make_train_step(cfg, model)
        return cfg, state, step

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    cfg_r, state_r, step_r = build("region")
    cfg_f, state_f, step_f = build("fused")

    data = SyntheticDetectionData(cfg_r, seed=123)
    p0 = state_r.params  # keep a copy (states get donated)
    p0 = jax.tree.map(lambda x: x.copy(), p0)

    for i in range(args.steps):
        batch = data.batch(i)
        state_r, m_r = step_r(state_r, batch)
        state_f, m_f = step_f(state_f, batch)
        print(f"step {i}: loss region={float(m_r['loss']):.6f} "
              f"fused={float(m_f['loss']):.6f}")

    upd_r = jax.tree.map(lambda new, old: new - old, state_r.params, p0)
    upd_f = jax.tree.map(lambda new, old: new - old, state_f.params, p0)
    rel = tree_group_rel(upd_f, upd_r)
    print("\nper-module relative L2 of the param UPDATE (fused vs region):")
    for k in sorted(rel):
        flag = "  <-- DIVERGENT" if rel[k] > 0.02 else ""
        print(f"  {k:30s} {rel[k]:.3e}{flag}")

    # also total
    num = sum(float(jnp.sum((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2))
              for a, b in zip(jax.tree.leaves(upd_f), jax.tree.leaves(upd_r)))
    den = sum(float(jnp.sum(b.astype(jnp.float32) ** 2))
              for b in jax.tree.leaves(upd_r))
    print(f"\nTOTAL rel L2: {(num ** 0.5) / max(den ** 0.5, 1e-12):.3e}")


if __name__ == "__main__":
    main()
