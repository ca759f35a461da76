"""End-to-end train-step tests: the minimum slice from SURVEY §7 —
darknet backbone + RPN + FPN mask head, batch 2, synthetic data, one jit.

All tests here share the one tiny_test train-step compile; variants that
need their own full-model compile live in test_train_variants.py /
test_c4_res5.py so each file finishes standalone on a cold compile cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.data import SyntheticDetectionData
from maskrcnn_tpu.train import create_train_state, init_model, make_train_step


def _to_device(batch):
    return jax.tree.map(jnp.asarray, batch)


@pytest.mark.slow
class TestTrainStep:
    def test_tiny_mask_step_runs_and_losses_finite(self):
        cfg = cfg_lib.tiny_test()
        model, variables = init_model(cfg, jax.random.key(0))
        state = create_train_state(cfg, variables, jax.random.key(1))
        step = make_train_step(cfg, model)
        data = SyntheticDetectionData(cfg)

        state, metrics = step(state, _to_device(data.batch(0)))
        for name, v in metrics.items():
            assert np.isfinite(float(v)), f"{name} not finite"
        assert float(metrics["loss"]) > 0
        assert int(state.step) == 1

    def test_loss_decreases_over_steps(self):
        # Overfit a single tiny batch — total loss must drop.
        cfg = cfg_lib.tiny_test()
        model, variables = init_model(cfg, jax.random.key(0))
        state = create_train_state(cfg, variables, jax.random.key(1))
        step = make_train_step(cfg, model)
        batch = _to_device(SyntheticDetectionData(cfg).batch(0))

        first = None
        for i in range(8):
            state, metrics = step(state, batch)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(last)
        assert last < first, (first, last)

    def test_grad_accum_requires_divisible_batch(self):
        cfg = cfg_lib._rep(cfg_lib.tiny_test(), train=dict(grad_accum_steps=3))
        model, variables = init_model(cfg, jax.random.key(0))
        with pytest.raises(ValueError, match="divisible"):
            make_train_step(cfg, model)

    def test_gradients_reach_backbone(self):
        cfg = cfg_lib.tiny_test()
        model, variables = init_model(cfg, jax.random.key(0))
        state = create_train_state(cfg, variables, jax.random.key(1))
        step = make_train_step(cfg, model)
        batch = _to_device(SyntheticDetectionData(cfg).batch(0))
        before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
        state, _ = step(state, batch)
        after = state.params

        def changed(path_leafs):
            b, a = path_leafs
            return not np.allclose(np.asarray(b), np.asarray(a))

        leaves_before = jax.tree.leaves(before)
        leaves_after = jax.tree.leaves(after)
        frac_changed = np.mean(
            [changed((b, a)) for b, a in zip(leaves_before, leaves_after)]
        )
        # zero-init biases with zero grads legitimately stay put; everything
        # else must move.
        assert frac_changed > 0.85
        # The first backbone conv specifically must receive gradient.
        b0 = before["extractor"]["conv1"]["Conv_0"]["kernel"]
        a0 = after["extractor"]["conv1"]["Conv_0"]["kernel"]
        assert not np.allclose(np.asarray(b0), np.asarray(a0))


