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


def test_sampler_keys_split_invariant():
    """Per-image key batches make sampling invariant to how a batch is
    split: rows [0:2) of a 4-image proposal_targets call equal a 2-image
    call on the first half with the same per-image keys. This is the
    property the grad-accum scan relies on (train/step.py img_keys)."""
    from maskrcnn_tpu.targets import proposal_targets

    rng = np.random.RandomState(0)
    b, r, g = 4, 64, 8
    yx = rng.uniform(0, 100, (b, r, 2, 2)).astype(np.float32)
    rois = jnp.concatenate(
        [jnp.minimum(yx[..., 0, :], yx[..., 1, :]),
         jnp.maximum(yx[..., 0, :], yx[..., 1, :]) + 4.0], axis=-1)
    roi_valid = jnp.ones((b, r), bool)
    roi_levels = jnp.zeros((b, r), jnp.int32)
    gt = jnp.asarray(
        np.sort(rng.uniform(0, 100, (b, g, 2, 2)), axis=2).reshape(b, g, 4)
        .astype(np.float32) + np.array([0, 0, 8, 8], np.float32))
    gt_labels = jnp.asarray(rng.randint(0, 3, (b, g)), dtype=jnp.int32)
    gt_valid = jnp.asarray(rng.rand(b, g) < 0.7)

    keys = jax.random.split(jax.random.key(7), b)
    full = proposal_targets(keys, rois, roi_valid, roi_levels,
                            gt, gt_labels, gt_valid, n_sample=16)
    half = proposal_targets(keys[:2], rois[:2], roi_valid[:2],
                            roi_levels[:2], gt[:2], gt_labels[:2],
                            gt_valid[:2], n_sample=16)
    for a, c in zip(half, full):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c)[:2])


def test_grad_accum_divergence_bounded():
    """Accum=2 vs accum=1 on a deliberately UNEVEN batch (one micro-batch
    rich in GT, the other nearly empty): with split-invariant per-image
    sampling keys the two draws are identical, so the divergence comes
    from (a) per-micro-batch loss normalization (losses divide by each
    micro-batch's own valid count) and (b) this config's darknet BN using
    per-micro-batch batch statistics (tiny_test trains BN, matching the
    reference darknet; the flagship presets freeze BN so only (a)
    applies there). Measured relative L2 of the one-step SGD update on
    this worst-ish case: 0.208, cosine 0.98 — assert rel < 0.35 and
    cosine > 0.9 so a structural regression (e.g. wrong keys per micro
    batch) fails loudly while the documented normalization effect
    passes."""
    base = cfg_lib._rep(cfg_lib.tiny_test(), train=dict(batch_size=4))
    model, variables = init_model(base, jax.random.key(0))
    batch = _to_device(SyntheticDetectionData(base).batch(0))
    # make counts uneven: images 2,3 keep only their first GT
    gv = np.asarray(batch.gt_valid).copy()
    gv[2:, 1:] = False
    batch = batch._replace(gt_valid=jnp.asarray(gv))

    def one_update(accum):
        cfg = cfg_lib._rep(base, train=dict(grad_accum_steps=accum))
        state = create_train_state(
            cfg, jax.tree.map(jnp.copy, variables), jax.random.key(1))
        step = make_train_step(cfg, model)
        s, _ = step(state, batch)
        return jax.tree.map(lambda n, o: np.asarray(n) - np.asarray(o),
                            s.params, variables["params"])

    u1, u2 = one_update(1), one_update(2)
    v1 = np.concatenate([x.ravel() for x in jax.tree.leaves(u1)])
    v2 = np.concatenate([x.ravel() for x in jax.tree.leaves(u2)])
    rel = np.linalg.norm(v1 - v2) / max(np.linalg.norm(v1), 1e-12)
    cos = float(v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)))
    assert rel < 0.35, rel
    assert cos > 0.9, cos


def test_chained_step_matches_sequential():
    """make_train_step(chain=K) is EXACTLY K sequential steps — the
    per-dispatch amortization for tunneled device links
    (cli/train.py --steps-per-dispatch) must not change numerics:
    same PRNG path, same batch order, same updates."""
    cfg = cfg_lib.tiny_test()
    model, variables = init_model(cfg, jax.random.key(0))
    data = SyntheticDetectionData(cfg)
    raw = [data.batch(i) for i in range(2)]

    state_a = create_train_state(
        cfg, jax.tree.map(jnp.copy, variables), jax.random.key(1))
    step = make_train_step(cfg, model)
    for b in raw:
        state_a, m_seq = step(state_a, _to_device(b))

    state_b = create_train_state(
        cfg, jax.tree.map(jnp.copy, variables), jax.random.key(1))
    chained = make_train_step(cfg, model, chain=2)
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *raw)
    state_b, m_ch = chained(state_b, stacked)

    assert int(state_a.step) == int(state_b.step) == 2
    # metrics come back stacked (chain,); the last row is the final step
    assert np.asarray(m_ch["loss"]).shape == (2,)
    np.testing.assert_allclose(
        float(np.asarray(m_ch["loss"])[-1]), float(m_seq["loss"]),
        rtol=1e-6)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=0, atol=1e-6)
