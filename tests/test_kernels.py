"""Pallas ROIAlign kernel tests (interpret path on CPU; the compiled kernel
is exercised on real TPU by bench/verification runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu import ops
from maskrcnn_tpu.kernels import multilevel_roi_align_pallas


def _setup(rng, b=2, c=8):
    shapes = [(32, 40), (16, 20)]
    scales = (0.25, 0.125)
    feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
             for h, w in shapes]
    rois = []
    for _ in range(12):
        y0 = rng.uniform(0, 80); x0 = rng.uniform(0, 100)
        hgt = rng.uniform(8, 60); wid = rng.uniform(8, 60)
        rois.append([y0, x0, y0 + hgt, x0 + wid])
    rois = jnp.asarray(np.array(rois, np.float32))
    bi = jnp.asarray(rng.randint(0, b, 12).astype(np.int32))
    lv = jnp.asarray(rng.randint(0, 2, 12).astype(np.int32))
    return feats, rois, bi, lv, scales


def test_interpret_matches_gather(rng):
    feats, rois, bi, lv, scales = _setup(rng)
    want = ops.multilevel_roi_align(feats, rois, bi, lv, (7, 7), scales,
                                    impl="gather")
    got = multilevel_roi_align_pallas(feats, rois, bi, lv, (7, 7), scales,
                                      t_span=22, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_vjp_matches_gather_grad(rng):
    feats, rois, bi, lv, scales = _setup(rng, b=1)

    def f_pallas(x):
        return multilevel_roi_align_pallas(
            [x, feats[1]], rois, bi, lv, (7, 7), scales,
            t_span=22, interpret=True,
        ).sum()

    def f_gather(x):
        return ops.multilevel_roi_align(
            [x, feats[1]], rois, bi, lv, (7, 7), scales, impl="gather"
        ).sum()

    g1 = jax.grad(f_pallas)(feats[0])
    g2 = jax.grad(f_gather)(feats[0])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_vjp_no_grad_to_level2(rng):
    """ROIs all on level 0 → level-1 features get exactly zero gradient."""
    feats, rois, bi, _, scales = _setup(rng, b=1)
    lv = jnp.zeros((12,), jnp.int32)

    def f(x):
        return multilevel_roi_align_pallas(
            [feats[0], x], rois, bi, lv, (7, 7), scales,
            t_span=22, interpret=True,
        ).sum()

    g = jax.grad(f)(feats[1])
    assert float(jnp.abs(g).max()) == 0.0
