"""Data-parallel tests on the 8-virtual-device CPU mesh (SURVEY §4) and
checkpoint round-trips."""

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


def _tiny_cfg(batch_size):
    cfg = cfg_lib.tiny_test()
    return cfg_lib._rep(cfg, train=dict(batch_size=batch_size))


class TestDataParallel:
    def test_8way_dp_step_runs(self):
        assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
        cfg = _tiny_cfg(batch_size=8)
        mesh = make_mesh(8)
        model, variables = init_model(cfg, jax.random.key(0))
        state = replicate(create_train_state(cfg, variables, jax.random.key(1)), mesh)
        step = make_parallel_train_step(cfg, model, mesh)
        batch = shard_batch(SyntheticDetectionData(cfg).batch(0), mesh)
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated after the update
        leaf = jax.tree.leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_matches_single_device(self):
        """Same batch, same PRNG: 8-way DP must produce the same loss and the
        same updated params as a single-device run (all-reduce correctness)."""
        cfg = _tiny_cfg(batch_size=8)
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


class TestCheckpoint:
    def test_roundtrip_exact(self, tmp_path):
        from maskrcnn_tpu.train.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
        )

        cfg = _tiny_cfg(batch_size=2)
        model, variables = init_model(cfg, jax.random.key(0))
        state = create_train_state(cfg, variables, jax.random.key(1))
        step = make_train_step(cfg, model)
        batch = jax.tree.map(jnp.asarray, SyntheticDetectionData(cfg).batch(0))
        state, _ = step(state, batch)

        path = save_checkpoint(str(tmp_path), state)
        assert latest_checkpoint(str(tmp_path)) == path

        template = create_train_state(cfg, variables, jax.random.key(1))
        restored = restore_checkpoint(path, template)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # training continues identically from the restored state
        s_a, m_a = step(state, batch)
        s_b, m_b = step(restored, batch)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-6)
