"""Shape/contract tests for backbones, RPN, heads, and the facade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.models import (
    MaskRCNN,
    anchors_for,
    generate_proposals,
)
from maskrcnn_tpu.models.backbones.fpn import (
    DarknetBackbone,
    FPNBackbone,
    upsample2x_nearest,
)


def test_upsample2x_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample2x_nearest(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, 0, :, 0]), [0, 0, 1, 1])
    np.testing.assert_allclose(np.asarray(y[0, 2, :, 0]), [2, 2, 3, 3])


def test_darknet_shapes():
    m = DarknetBackbone()
    x = jnp.zeros((2, 64, 96, 3))
    vars_ = m.init(jax.random.key(0), x)
    feats = m.apply(vars_, x)
    assert len(feats) == 1
    assert feats[0].shape == (2, 4, 6, 256)  # stride 16


@pytest.mark.slow
def test_fpn_shapes():
    m = FPNBackbone(channels=256)
    x = jnp.zeros((1, 128, 128, 3))
    vars_ = m.init(jax.random.key(0), x)
    feats = m.apply(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 32, 32, 256),
        (1, 16, 16, 256),
        (1, 8, 8, 256),
        (1, 4, 4, 256),
        (1, 2, 2, 256),
    ]


def test_proposal_generation_fixed_shapes():
    cfg = cfg_lib.tiny_test()
    h, w = cfg.train.image_size
    feat_shapes = [(h // 16, w // 16)]
    anchors = anchors_for(cfg, feat_shapes, (16,))
    a = anchors.shape[0]
    assert a == feat_shapes[0][0] * feat_shapes[0][1] * 3

    rng = np.random.RandomState(0)
    locs = jnp.asarray(rng.randn(2, a, 4).astype(np.float32) * 0.1)
    scores = jnp.asarray(rng.randn(2, a, 2).astype(np.float32))
    scale = jnp.ones((2,))
    img_hw = jnp.asarray([[h, w], [h - 16, w - 32]], jnp.float32)
    props = generate_proposals(
        locs, scores, jnp.asarray(anchors), scale, img_hw,
        n_pre=256, n_post=32, n_levels=1,
    )
    assert props.rois.shape == (2, 32, 4)
    assert props.valid.shape == (2, 32)
    assert bool(props.valid.any())
    # All valid rois clipped inside their image.
    rois0 = np.asarray(props.rois[1])[np.asarray(props.valid[1])]
    assert (rois0[:, 2] <= h - 16 + 1e-4).all()
    assert (rois0[:, 3] <= w - 32 + 1e-4).all()
    # Single-level model: all levels 0.
    assert np.asarray(props.levels).max() == 0


@pytest.mark.slow
class TestFacade:
    def _forward(self, cfg):
        model = MaskRCNN(cfg)
        h, w = cfg.train.image_size
        x = jnp.zeros((2, h, w, 3))
        vars_ = model.init(jax.random.key(0), x, method=MaskRCNN.init_forward)
        feats, rpn_locs, rpn_scores = model.apply(vars_, x)
        return model, vars_, feats, rpn_locs, rpn_scores

    def test_tiny_full_pipeline(self):
        cfg = cfg_lib.tiny_test()
        model, vars_, feats, rpn_locs, rpn_scores = self._forward(cfg)
        h, w = cfg.train.image_size
        a = (h // 16) * (w // 16) * 3
        assert rpn_locs.shape == (2, a, 4)
        assert rpn_scores.shape == (2, a, 2)

        anchors = anchors_for(cfg, [(h // 16, w // 16)], (16,))
        props = generate_proposals(
            rpn_locs, rpn_scores, jnp.asarray(anchors),
            jnp.ones((2,)), jnp.asarray([[h, w], [h, w]], jnp.float32),
            n_pre=cfg.proposals.n_train_pre_nms,
            n_post=cfg.proposals.n_train_post_nms,
            n_levels=len(feats),
        )
        r = cfg.proposals.n_train_post_nms
        # Flatten (B, R) slots → (B·R,) for the head.
        rois = props.rois.reshape(-1, 4)
        batch_idx = jnp.repeat(jnp.arange(2, dtype=jnp.int32), r)
        levels = props.levels.reshape(-1)

        locs, scores, masks = model.apply(
            vars_, feats, rois, batch_idx, levels, train=False,
            method=MaskRCNN.head_full,
        )
        n = 2 * r
        assert locs.shape == (n, 4)
        assert scores.shape == (n, cfg.model.n_fg_class + 1)
        assert masks.shape == (n, 28, 28, cfg.model.n_fg_class)

    def test_keypoint_head_shapes(self):
        cfg = cfg_lib.darknet_keypoint(n_keypoints=20)
        # shrink for test speed
        cfg = cfg.replace(train=cfg.train.__class__(
            batch_size=1, image_size=(128, 160), max_gt=4))
        model, vars_, feats, rpn_locs, rpn_scores = self._forward(cfg)
        rois = jnp.asarray([[8.0, 8.0, 72.0, 96.0]] * 6, jnp.float32)
        batch_idx = jnp.zeros((6,), jnp.int32)
        levels = jnp.zeros((6,), jnp.int32)
        locs, scores, heat = model.apply(
            vars_, feats, rois, batch_idx, levels,
            method=MaskRCNN.head_full,
        )
        assert locs.shape == (6, 4)
        assert scores.shape == (6, 2)
        assert heat.shape == (6, 56, 56, 20)

    @pytest.mark.slow
    def test_light_head_shapes(self):
        cfg = cfg_lib.light_head()
        cfg = cfg.replace(train=cfg.train.__class__(
            batch_size=1, image_size=(128, 160), max_gt=4))
        model = MaskRCNN(cfg)
        x = jnp.zeros((1, 128, 160, 3))
        vars_ = model.init(jax.random.key(0), x, method=MaskRCNN.init_forward)
        feats, _, _ = model.apply(vars_, x)
        assert feats[0].shape == (1, 8, 10, 1024)  # C4, stride 16
        rois = jnp.asarray([[8.0, 8.0, 72.0, 96.0]] * 4, jnp.float32)
        bi = jnp.zeros((4,), jnp.int32)
        lv = jnp.zeros((4,), jnp.int32)
        locs, scores, mask = model.apply(
            vars_, feats, rois, bi, lv, method=MaskRCNN.head_full)
        assert locs.shape == (4, 4)
        assert scores.shape == (4, 81)
        assert mask.shape == (4, 14, 14, 80)


def test_pyramid_shapes_p6_ceil():
    from maskrcnn_tpu.models.maskrcnn import pyramid_shapes
    cfg = cfg_lib.fpn_mask()
    shapes = pyramid_shapes(cfg, (800, 1024))
    assert shapes == [(200, 256), (100, 128), (50, 64), (25, 32), (13, 16)]
    cfg2 = cfg_lib.tiny_test()
    assert pyramid_shapes(cfg2, (128, 160)) == [(8, 10)]


def test_select_roi_locs_per_class():
    from maskrcnn_tpu.train.losses import select_roi_locs
    import jax.numpy as jnp
    # per-class head: (N, n_class*4); label picks the class's 4-vector
    locs = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 12)
    labels = jnp.asarray([2, 0])
    out = np.asarray(select_roi_locs(locs, labels))
    np.testing.assert_allclose(out[0], [8, 9, 10, 11])
    np.testing.assert_allclose(out[1], [12, 13, 14, 15])
    # class-agnostic passes through
    agn = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(select_roi_locs(agn, labels)), 1.0)


@pytest.mark.slow
def test_res5_head_shapes():
    from maskrcnn_tpu.models.heads import Res5Head
    h = Res5Head(n_class=4)
    pooled = jnp.zeros((3, 7, 7, 64))
    vars_ = h.init(jax.random.key(0), pooled, pooled)
    locs, scores, mask = h.apply(vars_, pooled, pooled)
    assert locs.shape == (3, 16)   # per-class 4*n_class
    assert scores.shape == (3, 4)
    assert mask.shape == (3, 14, 14, 3)


def test_stem_s2d_matches_direct_conv():
    """The space-to-depth stem computes the same sums as the direct 7x7/2
    conv (same param tree: one (7,7,3,64) kernel under conv1/kernel)."""
    from maskrcnn_tpu.models.backbones.resnet import ResNet50

    x = jax.random.normal(jax.random.key(0), (2, 64, 96, 3), jnp.float32)
    direct = ResNet50(stem_s2d=False, include_c5=False)
    s2d = ResNet50(stem_s2d=True, include_c5=False)
    v = direct.init(jax.random.key(1), x)
    # identical param trees: the s2d stem reuses conv1/kernel verbatim
    v2 = s2d.init(jax.random.key(1), x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    assert v["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    out_a = direct.apply(v, x)
    out_b = s2d.apply(v, x)
    for k in out_a:
        np.testing.assert_allclose(
            np.asarray(out_a[k]), np.asarray(out_b[k]), rtol=2e-5, atol=2e-5)


def test_keypoint_upsample_align_corners_golden():
    """align_corners=True 2x bilinear (chainer F.resize_images semantics,
    reference fpn_roi_keypoint_head.py:93): out[i] samples i*(n-1)/(2n-1)
    — hand-checked golden on a ramp."""
    import numpy as np
    import jax.numpy as jnp

    from maskrcnn_tpu.models.heads.fpn_heads import _upsample2x_align_corners

    x = jnp.broadcast_to(jnp.arange(3.0).reshape(1, 3, 1, 1), (1, 3, 3, 1))
    y = _upsample2x_align_corners(x)
    np.testing.assert_allclose(
        np.asarray(y[0, :, 0, 0]), [0, 0.4, 0.8, 1.2, 1.6, 2.0], atol=1e-6)
    np.testing.assert_allclose(  # constant along w stays constant
        np.asarray(y[0, 0, :, 0]), np.zeros(6), atol=1e-6)
