"""Train-step variants that each need their own full-model compile:
gradient accumulation. Split from test_train_step.py
so every test file completes standalone within a review window on a cold
compilation cache (one-ish compile per file)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.data import SyntheticDetectionData
from maskrcnn_tpu.train import create_train_state, init_model, make_train_step

pytestmark = pytest.mark.slow


def _to_device(batch):
    return jax.tree.map(jnp.asarray, batch)


def test_grad_accum_step_runs_and_learns():
    """grad_accum_steps=2 on batch 2 (micro-batch 1): finite losses,
    deterministic, and still overfits the batch — the single-chip
    path to batch ≥ 32 at full resolution (VERDICT round-1 #8)."""
    cfg = cfg_lib._rep(cfg_lib.tiny_test(), train=dict(grad_accum_steps=2))
    model, variables = init_model(cfg, jax.random.key(0))
    state = create_train_state(cfg, variables, jax.random.key(1))
    step = make_train_step(cfg, model)
    batch = _to_device(SyntheticDetectionData(cfg).batch(0))

    s1, m1 = step(state, batch)
    assert np.isfinite(float(m1["loss"])) and int(s1.step) == 1
    first = float(m1["loss"])
    s = s1
    for _ in range(7):
        s, m = step(s, batch)
    assert float(m["loss"]) < first, (first, float(m["loss"]))
