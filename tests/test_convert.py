"""Weight-converter test: fabricate a chainer-layout ResNet-50 npz and check
the converted tree drops into our flax ResNet50 with exact shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from maskrcnn_tpu.models.backbones.resnet import ResNet50
from maskrcnn_tpu.utils.convert_chainer import (
    convert_resnet50_npz,
    tree_shapes_match,
)


def fabricate_chainer_resnet50(rng) -> dict:
    """npz dict with chainer ResNet50Layers key layout and shapes."""
    d = {}

    def conv(name, o, i, k):
        # small scale so the 50-layer forward stays finite with random weights
        d[f"{name}/W"] = (rng.randn(o, i, k, k) * 0.05).astype(np.float32)

    def bn(name, c):
        d[f"{name}/gamma"] = rng.rand(c).astype(np.float32) + 0.5
        d[f"{name}/beta"] = rng.randn(c).astype(np.float32) * 0.1
        d[f"{name}/avg_mean"] = rng.randn(c).astype(np.float32) * 0.1
        d[f"{name}/avg_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    stages = {"res2": (3, 64, 256), "res3": (4, 128, 512),
              "res4": (6, 256, 1024), "res5": (3, 512, 2048)}
    in_ch = 64
    for stage, (n, mid, out) in stages.items():
        for i in range(n):
            cname = "a" if i == 0 else f"b{i}"
            cin = in_ch if i == 0 else out
            conv(f"{stage}/{cname}/conv1", mid, cin, 1)
            bn(f"{stage}/{cname}/bn1", mid)
            conv(f"{stage}/{cname}/conv2", mid, mid, 3)
            bn(f"{stage}/{cname}/bn2", mid)
            conv(f"{stage}/{cname}/conv3", out, mid, 1)
            bn(f"{stage}/{cname}/bn3", out)
        conv(f"{stage}/a/conv4", out, in_ch, 1)
        bn(f"{stage}/a/bn4", out)
        in_ch = out
    return d


def test_convert_matches_flax_layout(rng):
    npz = fabricate_chainer_resnet50(rng)
    params, stats = convert_resnet50_npz(npz)

    model = ResNet50()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    errs = tree_shapes_match(params, jax.tree.map(np.asarray, variables["params"]))
    assert not errs, errs[:10]
    errs = tree_shapes_match(stats, jax.tree.map(np.asarray, variables["batch_stats"]))
    assert not errs, errs[:10]

    # The converted tree must actually run.
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 64, 64, 3)))
    assert out["c5"].shape == (1, 2, 2, 2048)
    assert bool(jnp.isfinite(out["c5"]).all())


def test_conv_kernel_transpose_semantics(rng):
    # A 1x1 conv with known weights: chainer (O,I,1,1) → flax (1,1,I,O) must
    # compute the same linear map.
    from maskrcnn_tpu.utils.convert_chainer import _conv
    w = rng.randn(4, 3, 1, 1).astype(np.float32)
    x = rng.randn(2, 5, 5, 3).astype(np.float32)
    kernel = _conv(w)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    want = np.einsum("bhwi,oi->bhwo", x, w[:, :, 0, 0])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
