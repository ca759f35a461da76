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


def test_grad_accum_rolled_scan_matches_unrolled(monkeypatch):
    """The production-TPU rolled scan (one step, forced on CPU via
    MASKRCNN_ROLLED_ACCUM) produces the same update as the CPU-unrolled
    variant — keeps the rolled path covered even though CPU tests default
    to unrolling (it is ~20× slower per step on XLA:CPU, so one step only).
    """
    cfg = cfg_lib._rep(cfg_lib.tiny_test(), train=dict(grad_accum_steps=2))
    model, variables = init_model(cfg, jax.random.key(0))
    batch = _to_device(SyntheticDetectionData(cfg).batch(0))

    def one_step():
        state = create_train_state(
            cfg, jax.tree.map(jnp.copy, variables), jax.random.key(1))
        step = make_train_step(cfg, model)
        s, m = step(state, batch)
        return s, float(m["loss"])

    monkeypatch.setenv("MASKRCNN_ROLLED_ACCUM", "1")
    s_rolled, loss_rolled = one_step()
    monkeypatch.delenv("MASKRCNN_ROLLED_ACCUM")
    s_unrolled, loss_unrolled = one_step()

    assert loss_rolled == pytest.approx(loss_unrolled, rel=1e-5)
    for a, b in zip(jax.tree.leaves(s_rolled.params),
                    jax.tree.leaves(s_unrolled.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
