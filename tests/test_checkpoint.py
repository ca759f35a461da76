"""Full-train-state checkpoint round-trips (orbax): exact restore, latest
discovery, and identical continuation. Split from test_parallel.py so each
test file finishes standalone on a cold compile cache (this file shares the
tiny_test train-step compile with test_train_step.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.data import SyntheticDetectionData
from maskrcnn_tpu.train import create_train_state, init_model, make_train_step
from maskrcnn_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

pytestmark = pytest.mark.slow


def test_roundtrip_exact(tmp_path):
    cfg = cfg_lib.tiny_test()
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
