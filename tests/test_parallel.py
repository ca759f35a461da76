"""Data-parallel tests on the 8-virtual-device CPU mesh (SURVEY §4).

One test, two compiles (single-device + 8-way): 8-way DP must bit-match the
single-device step. Checkpoint round-trips live in test_checkpoint.py so
each file finishes standalone on a cold compile cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.data import SyntheticDetectionData
from maskrcnn_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from maskrcnn_tpu.train import create_train_state, init_model, make_train_step

pytestmark = pytest.mark.slow


def test_dp_matches_single_device():
    """Same batch, same PRNG: 8-way DP must produce the same loss and the
    same updated params as a single-device run (all-reduce correctness),
    and leave params replicated across the mesh."""
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    cfg = cfg_lib._rep(cfg_lib.tiny_test(), train=dict(batch_size=8))
    model, variables = init_model(cfg, jax.random.key(0))

    # Build BOTH states before any step: the step donates its input
    # state, whose buffers alias `variables`.
    s1 = create_train_state(cfg, jax.tree.map(jnp.copy, variables),
                            jax.random.key(1))
    mesh = make_mesh(8)
    s8 = replicate(
        create_train_state(cfg, jax.tree.map(jnp.copy, variables),
                           jax.random.key(1)),
        mesh,
    )

    # single device
    step1 = make_train_step(cfg, model)
    batch = SyntheticDetectionData(cfg).batch(0)
    s1, m1 = step1(s1, jax.tree.map(jnp.asarray, batch))
    step8 = make_parallel_train_step(cfg, model, mesh)
    s8, m8 = step8(s8, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-4
    )
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    # params stay replicated after the update
    leaf = jax.tree.leaves(s8.params)[0]
    assert leaf.sharding.is_fully_replicated

    # shard_map DP (the path that can run the Pallas fused ROIAlign
    # backward per device on multi-chip TPU meshes) must match gspmd:
    # same global batch, same PRNG → same loss and params. On this CPU
    # mesh roi_align "auto" resolves to the XLA backward in both modes,
    # so this checks the harness (local body, global-index sampling keys,
    # explicit pmean), not the kernel.
    s8b = replicate(
        create_train_state(cfg, jax.tree.map(jnp.copy, variables),
                           jax.random.key(1)),
        mesh,
    )
    step_sm = make_parallel_train_step(cfg, model, mesh, spmd="shard_map")
    s8b, m8b = step_sm(s8b, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8b["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(s8b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )
    leaf = jax.tree.leaves(s8b.params)[0]
    assert leaf.sharding.is_fully_replicated
