"""Golden tests: JAX detection ops vs naive numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

import golden
from maskrcnn_tpu import ops


def random_boxes(rng, n, size=200.0):
    yx = rng.uniform(0, size, (n, 2)).astype(np.float32)
    hw = rng.uniform(1, size / 2, (n, 2)).astype(np.float32)
    return np.concatenate([yx, yx + hw], axis=1)


class TestBoxes:
    def test_bbox2loc_matches_golden(self, rng):
        src = random_boxes(rng, 64)
        dst = random_boxes(rng, 64)
        got = np.asarray(ops.bbox2loc(jnp.asarray(src), jnp.asarray(dst)))
        want = golden.bbox2loc(src, dst)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_loc2bbox_roundtrip(self, rng):
        src = random_boxes(rng, 64)
        dst = random_boxes(rng, 64)
        loc = ops.bbox2loc(jnp.asarray(src), jnp.asarray(dst))
        back = np.asarray(ops.loc2bbox(jnp.asarray(src), loc))
        np.testing.assert_allclose(back, dst, rtol=1e-4, atol=1e-3)

    def test_loc2bbox_matches_golden(self, rng):
        src = random_boxes(rng, 32)
        loc = rng.uniform(-1, 1, (32, 4)).astype(np.float32)
        got = np.asarray(ops.loc2bbox(jnp.asarray(src), jnp.asarray(loc)))
        want = golden.loc2bbox(src, loc)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_iou_matches_golden(self, rng):
        a = random_boxes(rng, 20)
        b = random_boxes(rng, 30)
        got = np.asarray(ops.box_iou(jnp.asarray(a), jnp.asarray(b)))
        want = golden.box_iou(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_iou_degenerate_box_is_zero(self):
        a = np.array([[10, 10, 10, 10]], np.float32)  # zero area
        b = np.array([[0, 0, 100, 100]], np.float32)
        got = np.asarray(ops.box_iou(jnp.asarray(a), jnp.asarray(b)))
        assert got[0, 0] == 0.0

    def test_clip_boxes(self):
        b = np.array([[-5, -5, 300, 40], [10, 10, 20, 20]], np.float32)
        got = np.asarray(ops.clip_boxes(jnp.asarray(b), (100, 50)))
        np.testing.assert_allclose(
            got, [[0, 0, 100, 40], [10, 10, 20, 20]]
        )


class TestAnchors:
    def test_anchor_base_geometry(self):
        base = ops.generate_anchor_base(16.0, (0.5, 1.0, 2.0), (8.0,))
        assert base.shape == (3, 4)
        # All centered on (8, 8); areas equal (16*8)^2.
        cy = (base[:, 0] + base[:, 2]) / 2
        cx = (base[:, 1] + base[:, 3]) / 2
        np.testing.assert_allclose(cy, 8.0, atol=1e-4)
        np.testing.assert_allclose(cx, 8.0, atol=1e-4)
        areas = (base[:, 2] - base[:, 0]) * (base[:, 3] - base[:, 1])
        np.testing.assert_allclose(areas, (16 * 8) ** 2, rtol=1e-5)
        # Aspect ratios h/w = 0.5, 1, 2.
        ar = (base[:, 2] - base[:, 0]) / (base[:, 3] - base[:, 1])
        np.testing.assert_allclose(ar, [0.5, 1.0, 2.0], rtol=1e-5)

    def test_shifted_anchors_order(self):
        base = ops.generate_anchor_base(16.0, (1.0,), (1.0,))
        anchors = ops.shifted_anchors(base, 16, 2, 3)
        assert anchors.shape == (6, 4)
        # Position (0,1) (row-major index 1) shifted by stride in x.
        np.testing.assert_allclose(anchors[1] - anchors[0], [0, 16, 0, 16])
        # Position (1,0) (index 3) shifted by stride in y.
        np.testing.assert_allclose(anchors[3] - anchors[0], [16, 0, 16, 0])

    def test_multilevel_anchor_counts(self):
        levels = ops.multilevel_anchors(
            [(8, 8), (4, 4)], [16, 32], [4.0, 8.0]
        )
        assert levels[0].shape == (8 * 8 * 3, 4)
        assert levels[1].shape == (4 * 4 * 3, 4)


class TestNMS:
    @pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
    def test_matches_golden_greedy(self, rng, thresh):
        boxes = random_boxes(rng, 100, size=80.0)
        scores = rng.uniform(0, 1, 100).astype(np.float32)
        idx, valid = ops.nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), thresh, n_out=100
        )
        got = np.asarray(idx)[np.asarray(valid)]
        want = golden.greedy_nms(boxes, scores, thresh)
        np.testing.assert_array_equal(got, want)

    def test_respects_validity_mask(self, rng):
        boxes = random_boxes(rng, 50)
        scores = rng.uniform(0, 1, 50).astype(np.float32)
        valid = np.zeros(50, bool)
        valid[:10] = True
        idx, ovalid = ops.nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20, jnp.asarray(valid)
        )
        got = set(np.asarray(idx)[np.asarray(ovalid)].tolist())
        assert got <= set(range(10))
        want = golden.greedy_nms(boxes[:10], scores[:10], 0.5)
        assert got == set(want.tolist())

    def test_truncates_to_n_out(self, rng):
        # Far-apart boxes: nothing suppressed; top-5 by score survive.
        boxes = np.array(
            [[i * 100.0, 0, i * 100.0 + 10, 10] for i in range(20)], np.float32
        )
        scores = rng.uniform(0, 1, 20).astype(np.float32)
        idx, valid = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
        assert np.asarray(valid).all()
        want = np.argsort(-scores, kind="stable")[:5]
        np.testing.assert_array_equal(np.asarray(idx), want)

    def test_class_aware_nms_separates_classes(self):
        # Two identical boxes, different classes: both survive.
        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
        scores = np.array([0.9, 0.8], np.float32)
        cls = np.array([0, 1], np.int32)
        _, valid = ops.batched_nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls), 0.5, 2
        )
        assert np.asarray(valid).sum() == 2
        # Same class: one suppressed.
        cls_same = np.array([1, 1], np.int32)
        _, valid2 = ops.batched_nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls_same), 0.5, 2
        )
        assert np.asarray(valid2).sum() == 1


class TestLevels:
    def test_matches_golden(self, rng):
        rois = random_boxes(rng, 200, size=600.0)
        got = np.asarray(ops.map_rois_to_fpn_levels(jnp.asarray(rois)))
        want = golden.map_rois_to_fpn_levels(rois)
        np.testing.assert_array_equal(got, want)

    def test_canonical_sizes(self):
        # The reference maps a 224-px ROI to level 4 (no −2 shift);
        # small ROIs clip to 0.
        def roi(side):
            return np.array([[0, 0, side, side]], np.float32)

        assert int(ops.map_rois_to_fpn_levels(jnp.asarray(roi(224)))[0]) == 4
        assert int(ops.map_rois_to_fpn_levels(jnp.asarray(roi(10)))[0]) == 0
        assert int(ops.map_rois_to_fpn_levels(jnp.asarray(roi(112)))[0]) == 3


class TestRoiAlign:
    def test_single_level_matches_golden(self, rng):
        feats = rng.randn(16, 16, 8).astype(np.float32)
        rois = random_boxes(rng, 12, size=60.0)
        got = np.asarray(
            ops.roi_align(jnp.asarray(feats), jnp.asarray(rois), (7, 7), 0.25)
        )
        want = golden.roi_align(feats, rois, (7, 7), 0.25)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_multilevel_matches_per_level_golden(self, rng):
        b, c = 2, 4
        shapes = [(16, 16), (8, 8)]
        scales = (0.25, 0.125)
        feats = [rng.randn(b, h, w, c).astype(np.float32) for h, w in shapes]
        rois = random_boxes(rng, 10, size=50.0)
        batch_idx = rng.randint(0, b, 10).astype(np.int32)
        levels = rng.randint(0, 2, 10).astype(np.int32)
        got = np.asarray(
            ops.multilevel_roi_align(
                [jnp.asarray(f) for f in feats],
                jnp.asarray(rois),
                jnp.asarray(batch_idx),
                jnp.asarray(levels),
                (7, 7),
                scales,
            )
        )
        for i in range(10):
            lvl, bi = int(levels[i]), int(batch_idx[i])
            want = golden.roi_align(
                feats[lvl][bi], rois[i : i + 1], (7, 7), scales[lvl]
            )[0]
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("widths", [(32, 16), (30, 15)])
    def test_shared_region_pair_matches_separate(self, rng, widths):
        """multilevel_roi_align_train (one shared gather, box-origin
        windows, 8-folded when widths allow / plain when not) must match
        two independent pools."""
        from maskrcnn_tpu.ops.roi_align import multilevel_roi_align_train

        b, n, n_pos, c = 2, 6, 3, 4
        shapes = [(24, widths[0]), (12, widths[1])]
        scales = (0.25, 0.125)
        feats = [
            jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
            for h, w in shapes
        ]
        rois = random_boxes(rng, b * n, size=50.0).reshape(b, n, 4)
        levels = rng.randint(0, 2, (b, n)).astype(np.int32)
        got_box, got_mask = multilevel_roi_align_train(
            feats, jnp.asarray(rois), jnp.asarray(levels), n_pos,
            (7, 7), (14, 14), scales,
        )
        bi = np.repeat(np.arange(b, dtype=np.int32), n)
        want_box = ops.multilevel_roi_align(
            feats, jnp.asarray(rois.reshape(-1, 4)), jnp.asarray(bi),
            jnp.asarray(levels.reshape(-1)), (7, 7), scales,
        )
        pos_bi = np.repeat(np.arange(b, dtype=np.int32), n_pos)
        want_mask = ops.multilevel_roi_align(
            feats, jnp.asarray(rois[:, :n_pos].reshape(-1, 4)),
            jnp.asarray(pos_bi),
            jnp.asarray(levels[:, :n_pos].reshape(-1)), (14, 14), scales,
        )
        np.testing.assert_allclose(got_box, want_box, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got_mask, want_mask, rtol=1e-4, atol=1e-4)

    def test_gradients_flow_to_features(self, rng):
        import jax

        feats = jnp.asarray(rng.randn(8, 8, 2).astype(np.float32))
        rois = jnp.asarray(np.array([[4.0, 4.0, 24.0, 24.0]], np.float32))

        def f(x):
            return ops.roi_align(x, rois, (2, 2), 0.25).sum()

        g = jax.grad(f)(feats)
        assert np.asarray(jnp.abs(g).sum()) > 0


class TestNMSFixpoint:
    """The fixpoint algorithm must equal the sequential greedy oracle."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
    def test_equals_sequential(self, seed, thresh):
        r = np.random.RandomState(seed)
        # dense overlapping boxes to force deep suppression chains
        boxes = random_boxes(r, 200, size=60.0)
        scores = r.uniform(0, 1, 200).astype(np.float32)
        i1, v1 = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                thresh, 200, algorithm="fixpoint")
        i2, v2 = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                thresh, 200, algorithm="sequential")
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("thresh", [0.3, 0.7])
    def test_fixpoint_static_equals_sequential(self, seed, thresh):
        r = np.random.RandomState(seed + 50)
        boxes = random_boxes(r, 200, size=60.0)
        scores = r.uniform(0, 1, 200).astype(np.float32)
        i1, v1 = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                thresh, 200, algorithm="fixpoint_static")
        i2, v2 = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                thresh, 200, algorithm="sequential")
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("thresh", [0.3, 0.7])
    def test_chunked_equals_sequential(self, seed, thresh):
        """Chunked streaming NMS (the 12000-proposal parity path) is exact:
        small chunks + a tight n_out buffer reproduce the greedy oracle,
        including cross-chunk suppression and buffer-overflow ranks."""
        r = np.random.RandomState(seed + 100)
        n = 500  # not a multiple of chunk → exercises tail padding
        boxes = random_boxes(r, n, size=60.0)
        scores = r.uniform(0, 1, n).astype(np.float32)
        valid = r.uniform(0, 1, n) > 0.1
        for n_out in (40, 500):
            i1, v1 = ops.nms_padded(
                jnp.asarray(boxes), jnp.asarray(scores), thresh, n_out,
                jnp.asarray(valid), algorithm="chunked", chunk_size=128)
            i2, v2 = ops.nms_padded(
                jnp.asarray(boxes), jnp.asarray(scores), thresh, n_out,
                jnp.asarray(valid), algorithm="sequential")
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_auto_dispatches_chunked_above_4096(self):
        r = np.random.RandomState(7)
        n = 5000
        boxes = random_boxes(r, n, size=200.0)
        scores = r.uniform(0, 1, n).astype(np.float32)
        ia, va = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                0.7, 300)  # auto → chunked
        ifx, vfx = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                  0.7, 300, algorithm="fixpoint")
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vfx))
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ifx))

    def test_chain_case(self):
        # a>b>c suppression chain: b dies to a, c must survive (b is dead).
        boxes = np.array([
            [0, 0, 10, 10],
            [0, 6, 10, 16],   # overlaps a (IoU ~0.25) and c
            [0, 12, 10, 22],  # overlaps b only
        ], np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        idx, valid = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.2, 3)
        kept = set(np.asarray(idx)[np.asarray(valid)].tolist())
        assert kept == {0, 2}


class TestRoiAlignRegion:
    """Region-matrix implementation must match the gather implementation."""

    def test_matches_gather_multilevel(self, rng):
        b, c = 2, 8
        shapes = [(32, 40), (16, 20)]
        scales = (0.25, 0.125)
        feats = [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
                 for h, w in shapes]
        # ROIs sized so spans stay within the region window
        rois = []
        for _ in range(16):
            y0 = rng.uniform(0, 80); x0 = rng.uniform(0, 100)
            hgt = rng.uniform(8, 60); wid = rng.uniform(8, 60)
            rois.append([y0, x0, y0 + hgt, x0 + wid])
        rois = jnp.asarray(np.array(rois, np.float32))
        bi = jnp.asarray(rng.randint(0, b, 16).astype(np.int32))
        lv = jnp.asarray(rng.randint(0, 2, 16).astype(np.int32))
        a = ops.multilevel_roi_align(feats, rois, bi, lv, (7, 7), scales,
                                     impl="gather")
        g = ops.multilevel_roi_align(feats, rois, bi, lv, (7, 7), scales,
                                     impl="region", t_span=22)
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)

    def test_offscreen_and_degenerate(self, rng):
        feats = [jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))]
        rois = jnp.asarray(np.array(
            [[-200, -200, -100, -100], [5, 5, 5, 5]], np.float32))
        bi = jnp.zeros((2,), jnp.int32)
        lv = jnp.zeros((2,), jnp.int32)
        a = ops.multilevel_roi_align(feats, rois, bi, lv, (7, 7), (0.25,),
                                     impl="gather")
        g = ops.multilevel_roi_align(feats, rois, bi, lv, (7, 7), (0.25,),
                                     impl="region", t_span=19)
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
        assert bool(jnp.isfinite(g).all())

    def test_region_gradients(self, rng):
        import jax
        feats = [jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))]
        rois = jnp.asarray(np.array([[8.0, 8.0, 40.0, 40.0]], np.float32))
        bi = jnp.zeros((1,), jnp.int32)
        lv = jnp.zeros((1,), jnp.int32)

        def f(x):
            return ops.multilevel_roi_align(
                [x], rois, bi, lv, (7, 7), (0.25,), impl="region", t_span=19
            ).sum()

        def f2(x):
            return ops.multilevel_roi_align(
                [x], rois, bi, lv, (7, 7), (0.25,), impl="gather"
            ).sum()

        g1 = jax.grad(f)(feats[0])
        g2 = jax.grad(f2)(feats[0])
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)
