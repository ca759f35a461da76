"""Tests for the dependency-free COCO loader: RLE codec, polygon raster,
index remapping, and end-to-end example/batch shapes on a fabricated dataset."""

import json
import os

import numpy as np
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.data.coco import (
    COCODetectionLoader,
    COCOIndex,
    ann_to_mask,
    polygons_to_mask,
    rle_decode,
)


def rle_encode_counts(mask: np.ndarray) -> list[int]:
    """Reference RLE encoder (column-major runs starting with 0s)."""
    flat = mask.T.reshape(-1)
    counts = []
    prev = 0
    run = 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev = v
            run = 1
    counts.append(run)
    return counts


def compress_counts(counts: list[int]) -> str:
    """pycocotools rleToString equivalent (for decoder round-trip tests)."""
    out = []
    for i, c in enumerate(counts):
        x = c - (counts[i - 2] if i > 2 else 0)
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            more = not (
                (x == 0 and not (chunk & 0x10)) or (x == -1 and (chunk & 0x10))
            )
            if more:
                chunk |= 0x20
            out.append(chr(chunk + 48))
    return "".join(out)


class TestRLE:
    def test_uncompressed_roundtrip(self, rng):
        mask = (rng.rand(13, 17) > 0.6).astype(np.uint8)
        counts = rle_encode_counts(mask)
        dec = rle_decode({"size": [13, 17], "counts": counts})
        np.testing.assert_array_equal(dec, mask)

    def test_compressed_roundtrip(self, rng):
        mask = (rng.rand(29, 31) > 0.5).astype(np.uint8)
        counts = rle_encode_counts(mask)
        s = compress_counts(counts)
        dec = rle_decode({"size": [29, 31], "counts": s})
        np.testing.assert_array_equal(dec, mask)

    def test_polygon_square(self):
        m = polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
        assert m[5, 5] == 1
        assert m[0, 0] == 0
        assert m[3:10, 3:10].all()


@pytest.fixture
def mini_coco(tmp_path):
    import cv2

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val").mkdir()

    images, annotations = [], []
    for i in range(3):
        name = f"{i:06d}.jpg"
        img = np.full((64, 80, 3), 30 * (i + 1), np.uint8)
        cv2.imwrite(str(root / "val" / name), img)
        images.append({"id": 100 + i, "file_name": name, "height": 64, "width": 80})
        # one polygon box per image
        annotations.append({
            "id": 1000 + i,
            "image_id": 100 + i,
            "category_id": 7 if i % 2 == 0 else 21,
            "bbox": [10, 8, 30, 20],  # x, y, w, h
            "area": 600,
            "iscrowd": 0,
            "segmentation": [[10, 8, 40, 8, 40, 28, 10, 28]],
        })
    # an RLE (uncompressed) annotation on image 0
    m = np.zeros((64, 80), np.uint8)
    m[40:60, 50:70] = 1
    annotations.append({
        "id": 2000,
        "image_id": 100,
        "category_id": 21,
        "bbox": [50, 40, 20, 20],
        "area": 400,
        "iscrowd": 0,
        "segmentation": {"size": [64, 80], "counts": rle_encode_counts(m)},
    })
    # a crowd annotation that must be skipped
    annotations.append({
        "id": 3000,
        "image_id": 101,
        "category_id": 7,
        "bbox": [0, 0, 10, 10],
        "area": 100,
        "iscrowd": 1,
        "segmentation": {"size": [64, 80], "counts": [64 * 80]},
    })
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": 7, "name": "cat"},
            {"id": 21, "name": "dog"},
        ],
    }
    with open(root / "annotations" / "instances_val.json", "w") as f:
        json.dump(data, f)
    return str(root)


class TestCOCOLoader:
    def test_index_remap(self, mini_coco):
        idx = COCOIndex(os.path.join(mini_coco, "annotations/instances_val.json"))
        assert idx.cat_to_contiguous == {7: 0, 21: 1}
        assert idx.label_names == ["cat", "dog"]

    def test_example_shapes_and_content(self, mini_coco):
        cfg = cfg_lib.tiny_test()
        loader = COCODetectionLoader(mini_coco, "val", cfg, flip=False)
        assert len(loader) == 3
        ex = loader.get_example(0)
        bh, bw = cfg.train.image_size
        assert ex["image"].shape == (bh, bw, 3)
        # 64x80 → scale limited by bucket (128/64=2 vs 160/80=2 vs 600/64): 2
        assert ex["scale"] == pytest.approx(2.0)
        np.testing.assert_allclose(ex["img_hw"], [128, 160])
        # image 100 has 2 annotations (polygon + RLE)
        assert ex["gt_valid"].sum() == 2
        # polygon box scaled ×2: (y0,x0,y1,x1) = (16, 20, 56, 80)
        np.testing.assert_allclose(ex["gt_boxes"][0], [16, 20, 56, 80], atol=1.0)
        assert ex["gt_labels"][0] == 0  # cat
        assert ex["gt_labels"][1] == 1  # dog (RLE ann)
        # mask crops: polygon is solid → crop all 1
        assert ex["gt_masks"][0].mean() > 0.95
        assert ex["gt_masks"][1].mean() > 0.95

    def test_crowd_skipped(self, mini_coco):
        cfg = cfg_lib.tiny_test()
        loader = COCODetectionLoader(mini_coco, "val", cfg, flip=False)
        i = loader.ids.index(101)
        ex = loader.get_example(i)
        assert ex["gt_valid"].sum() == 1  # crowd ann dropped

    def test_batch_iteration(self, mini_coco):
        cfg = cfg_lib.tiny_test()
        loader = COCODetectionLoader(mini_coco, "val", cfg, flip=False)
        batch = next(iter(loader))
        assert batch.images.shape[0] == cfg.train.batch_size
        assert batch.gt_boxes.shape == (2, cfg.train.max_gt, 4)
        assert batch.gt_masks is not None

    def test_iter_from_is_step_pure(self, mini_coco):
        """iter_from(k) must yield exactly what iter_from(0) yields at step
        k — shuffles and augmentation draws are functions of the step, not
        iterator history (the data half of exact --resume)."""
        cfg = cfg_lib.tiny_test()
        a = COCODetectionLoader(mini_coco, "val", cfg, flip=True, seed=5)
        b = COCODetectionLoader(mini_coco, "val", cfg, flip=True, seed=5)
        full = [next(it) for it in [a.iter_from(0)] * 1 for _ in range(6)]
        seek = b.iter_from(3)
        for k in range(3, 6):
            got = next(seek)
            for x, y in zip(full[k], got):
                if x is None:
                    assert y is None
                else:
                    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_iter_from_different_seed_differs(self, mini_coco):
        cfg = cfg_lib.tiny_test()
        a = COCODetectionLoader(mini_coco, "val", cfg, flip=True, seed=5)
        b = COCODetectionLoader(mini_coco, "val", cfg, flip=True, seed=6)
        xa = next(a.iter_from(0)).images
        xb = next(b.iter_from(0)).images
        assert not np.array_equal(xa, xb)

    def test_flip_consistency(self, mini_coco):
        cfg = cfg_lib.tiny_test()
        loader = COCODetectionLoader(mini_coco, "val", cfg, flip=True, seed=3)
        # find a flipped example deterministically
        for _ in range(10):
            ex = loader.get_example(0)
            y0, x0, y1, x1 = ex["gt_boxes"][0]
            assert 0 <= x0 < x1 <= 160
            assert 0 <= y0 < y1 <= 128


@pytest.fixture
def mixed_aspect_coco(tmp_path):
    """Real-schema COCO dir with both landscape and portrait images."""
    import cv2

    root = tmp_path / "coco_mixed"
    (root / "annotations").mkdir(parents=True)
    (root / "val").mkdir()
    images, annotations = [], []
    sizes = [(64, 96), (96, 64), (64, 96), (96, 64), (60, 90), (90, 60)]
    for i, (h0, w0) in enumerate(sizes):
        name = f"{i:06d}.jpg"
        cv2.imwrite(str(root / "val" / name),
                    np.full((h0, w0, 3), 40 * (i % 5 + 1), np.uint8))
        images.append({"id": 1 + i, "file_name": name,
                       "height": h0, "width": w0})
        annotations.append({
            "id": 100 + i, "image_id": 1 + i, "category_id": 7,
            "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0,
            "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]],
        })
    with open(root / "annotations" / "instances_val.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 7, "name": "cat"}]}, f)
    return str(root)


class TestMultiBucket:
    """SURVEY §5 'bucketed padded resolutions' / VERDICT round-1 #10."""

    def _cfg(self):
        cfg = cfg_lib.tiny_test()
        return cfg_lib._rep(
            cfg, train=dict(image_buckets=((128, 160), (160, 128))))

    def test_bucket_assignment_by_aspect(self, mixed_aspect_coco):
        loader = COCODetectionLoader(
            mixed_aspect_coco, "val", self._cfg(), flip=False)
        for i in range(len(loader)):
            info = loader.index.images[loader.ids[i]]
            want = 0 if info["width"] >= info["height"] else 1
            assert loader.bucket_of(i) == want, (i, info)

    def test_batches_are_shape_homogeneous(self, mixed_aspect_coco):
        loader = COCODetectionLoader(
            mixed_aspect_coco, "val", self._cfg(), flip=False)
        shapes = set()
        it = loader.iter_from(0)
        for _ in range(4):
            b = next(it)
            shapes.add(b.images.shape[1:3])
            # every example fills its bucket without cross-shape mixing
            assert b.images.shape[1:3] in {(128, 160), (160, 128)}
        assert len(shapes) == 2  # both buckets appear in the stream

    def test_bucketed_iter_is_step_pure(self, mixed_aspect_coco):
        cfg = self._cfg()
        a = COCODetectionLoader(mixed_aspect_coco, "val", cfg, seed=5)
        b = COCODetectionLoader(mixed_aspect_coco, "val", cfg, seed=5)
        full = [next(it) for it in [a.iter_from(0)] for _ in range(6)]
        seek = b.iter_from(4)
        for k in range(4, 6):
            got = next(seek)
            for x, y in zip(full[k], got):
                if x is None:
                    assert y is None
                else:
                    np.testing.assert_array_equal(np.asarray(x),
                                                  np.asarray(y))

    def test_buckets_reduce_padding_waste(self, mixed_aspect_coco):
        cfg1 = cfg_lib.tiny_test()  # single 128×160 bucket
        cfg2 = self._cfg()
        l1 = COCODetectionLoader(mixed_aspect_coco, "val", cfg1, flip=False)
        l2 = COCODetectionLoader(mixed_aspect_coco, "val", cfg2, flip=False)
        for it, loader in ((iter(l1), l1), (iter(l2), l2)):
            for _ in range(3):
                next(it)
        assert l2.padding_waste() < l1.padding_waste() - 0.05, (
            l1.padding_waste(), l2.padding_waste())


class TestNativeParity:
    """C++ library vs numpy/cv2 fallbacks — same outputs."""

    def _require(self):
        from maskrcnn_tpu.data import _native
        if not _native.available():
            pytest.skip("native lib not built (make -C native)")
        return _native

    def test_rle_uncompressed(self, rng):
        native = self._require()
        from maskrcnn_tpu.data.coco import _rle_decode_np
        mask = (rng.rand(23, 31) > 0.6).astype(np.uint8)
        rle = {"size": [23, 31], "counts": rle_encode_counts(mask)}
        np.testing.assert_array_equal(native.rle_decode(rle), _rle_decode_np(rle))

    def test_rle_compressed(self, rng):
        native = self._require()
        from maskrcnn_tpu.data.coco import _rle_decode_np
        mask = (rng.rand(37, 19) > 0.4).astype(np.uint8)
        rle = {"size": [37, 19],
               "counts": compress_counts(rle_encode_counts(mask))}
        np.testing.assert_array_equal(native.rle_decode(rle), _rle_decode_np(rle))
        np.testing.assert_array_equal(native.rle_decode(rle), mask)

    def test_polygon_close_to_cv2(self):
        native = self._require()
        from maskrcnn_tpu.data.coco import _polygons_to_mask_cv2
        polys = [[5.2, 3.1, 28.9, 4.0, 30.0, 25.5, 8.0, 27.0]]
        a = native.polygons_to_mask(polys, 32, 36)
        b = _polygons_to_mask_cv2(polys, 32, 36)
        # raster conventions differ by <= a 1px boundary ring
        disagree = (a != b).sum()
        assert disagree <= 0.1 * b.sum(), (disagree, b.sum())

    def test_crop_resize_mask_matches_cv2(self, rng):
        import cv2
        native = self._require()
        mask = (rng.rand(64, 80) > 0.5).astype(np.uint8)
        box = (10, 12, 50, 70)
        got = native.crop_resize_mask(mask, box, 28)
        crop = mask[10:50, 12:70].astype(np.float32)
        want = cv2.resize(crop, (28, 28), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPrefetcher:
    def test_yields_in_order_and_overlaps(self):
        from maskrcnn_tpu.data.prefetch import Prefetcher
        import time

        def slow_gen():
            for i in range(5):
                time.sleep(0.02)
                yield i

        p = Prefetcher(slow_gen(), size=2)
        assert list(p) == [0, 1, 2, 3, 4]

    def test_propagates_errors(self):
        from maskrcnn_tpu.data.prefetch import Prefetcher

        def bad_gen():
            yield 1
            raise RuntimeError("loader broke")

        p = Prefetcher(bad_gen())
        assert next(p) == 1
        with pytest.raises(RuntimeError, match="loader broke"):
            for _ in p:
                pass


# --- keypoint flip correctness (round 2: VERDICT Weak #4) -------------------

class _AlwaysFlip:
    def rand(self):
        return 0.0  # < 0.5 → flip

    def uniform(self, a, b):
        return 0.0

    def shuffle(self, x):
        pass


class _NeverFlip(_AlwaysFlip):
    def rand(self):
        return 1.0


def test_flip_permutation_names():
    from maskrcnn_tpu.data.keypoints import (
        COCO_KEYPOINT_NAMES,
        DEPTH_KEYPOINT_NAMES,
        flip_permutation,
        keypoint_flip_map,
    )

    p17 = flip_permutation(COCO_KEYPOINT_NAMES)
    i = {n: k for k, n in enumerate(COCO_KEYPOINT_NAMES)}
    assert p17[i["left_eye"]] == i["right_eye"]
    assert p17[i["right_ankle"]] == i["left_ankle"]
    assert p17[i["nose"]] == i["nose"]
    # involution: flipping twice is identity
    assert (p17[p17] == np.arange(17)).all()

    p20 = flip_permutation(DEPTH_KEYPOINT_NAMES)
    j = {n: k for k, n in enumerate(DEPTH_KEYPOINT_NAMES)}
    assert p20[j["ShoulderLeft"]] == j["ShoulderRight"]
    assert p20[j["FootRight"]] == j["FootLeft"]
    assert p20[j["SpineMid"]] == j["SpineMid"]
    assert (p20[p20] == np.arange(20)).all()

    fm = keypoint_flip_map(DEPTH_KEYPOINT_NAMES)
    # complete: reference vis.py:29-36 pairs plus the Ankle/Hand pairs it missed
    assert fm["AnkleLeft"] == "AnkleRight"
    assert fm["HandLeft"] == "HandRight"
    assert fm["ShoulderLeft"] == "ShoulderRight"


@pytest.fixture
def mini_coco_kp(tmp_path):
    import cv2

    root = tmp_path / "cocokp"
    (root / "annotations").mkdir(parents=True)
    (root / "val").mkdir()
    img = np.full((64, 80, 3), 99, np.uint8)
    cv2.imwrite(str(root / "val" / "000000.jpg"), img)
    # 17 keypoints, all visible, at distinct x positions
    kps = []
    for k in range(17):
        kps.extend([10 + 4 * k, 20 + k, 2])  # x, y, v
    data = {
        "images": [{"id": 1, "file_name": "000000.jpg",
                    "height": 64, "width": 80}],
        "annotations": [{
            "id": 10, "image_id": 1, "category_id": 1,
            "bbox": [8, 18, 70, 20], "area": 1400, "iscrowd": 0,
            "num_keypoints": 17, "keypoints": kps,
        }],
        "categories": [{"id": 1, "name": "person"}],
    }
    with open(root / "annotations" / "person_keypoints_val.json", "w") as f:
        json.dump(data, f)
    return str(root)


def test_coco_keypoint_flip_swaps_sides(mini_coco_kp):
    """A flipped example's left_* keypoints must land where right_* were
    (mirrored), not merely mirror in place."""
    from maskrcnn_tpu.data.keypoints import COCO_KEYPOINT_NAMES

    cfg = cfg_lib._rep(cfg_lib.tiny_test(), model=dict(n_keypoints=17))
    plain = COCODetectionLoader(mini_coco_kp, "val", cfg, keypoints=True,
                                flip=False)
    flipped = COCODetectionLoader(mini_coco_kp, "val", cfg, keypoints=True,
                                  flip=True)
    flipped.rng = _AlwaysFlip()

    a = plain.get_example(0)["gt_keypoints"][0]   # (17, 3) y, x, v
    b = flipped.get_example(0)["gt_keypoints"][0]
    idx = {n: k for k, n in enumerate(COCO_KEYPOINT_NAMES)}

    # content width after resize = bucket-clamped; recover it from the image
    nw = int(plain.get_example(0)["img_hw"][1])

    for left, right in [("left_eye", "right_eye"),
                        ("left_wrist", "right_wrist"),
                        ("left_ankle", "right_ankle")]:
        li, ri = idx[left], idx[right]
        # flipped left joint = mirror of the ORIGINAL right joint
        np.testing.assert_allclose(b[li, 1], nw - a[ri, 1], atol=1e-4)
        np.testing.assert_allclose(b[li, 0], a[ri, 0], atol=1e-4)
        np.testing.assert_allclose(b[ri, 1], nw - a[li, 1], atol=1e-4)
    # nose (unpaired) mirrors in place
    ni = idx["nose"]
    np.testing.assert_allclose(b[ni, 1], nw - a[ni, 1], atol=1e-4)
    # y and visibility unchanged everywhere
    np.testing.assert_allclose(np.sort(b[:, 0]), np.sort(a[:, 0]), atol=1e-4)
    assert (b[:, 2] == 2).all()


def test_coco_category_filter(mini_coco):
    """OR-of-categories image selection (reference coco_dataset.py:30-39)."""
    cfg = cfg_lib.tiny_test()
    all_ids = COCODetectionLoader(mini_coco, "val", cfg).ids
    cat_only = COCODetectionLoader(mini_coco, "val", cfg,
                                   category_filter=["cat"]).ids
    dog_only = COCODetectionLoader(mini_coco, "val", cfg,
                                   category_filter=["dog"]).ids
    assert set(cat_only) == {100, 102}  # images with a non-crowd cat ann
    assert set(dog_only) == {100, 101}  # polygon dog on 101, RLE dog on 100
    assert set(cat_only) | set(dog_only) == set(all_ids)
    with pytest.raises(ValueError, match="unknown"):
        COCODetectionLoader(mini_coco, "val", cfg, category_filter=["yeti"])


def test_depth_flip_swaps_sides(tmp_path):
    from maskrcnn_tpu.data.depth import DepthKeypointDataset
    from maskrcnn_tpu.data.keypoints import DEPTH_KEYPOINT_NAMES

    rng = np.random.RandomState(0)
    depth = rng.uniform(1000, 4000, (48, 64)).astype(np.float32)
    kp = np.zeros((20, 2), np.float32)
    kp[:, 0] = np.linspace(5, 59, 20)  # x
    kp[:, 1] = np.linspace(5, 43, 20)  # y
    np.savez(tmp_path / "f0.npz", depth=depth, keypoints=kp)
    manifest = tmp_path / "list.txt"
    manifest.write_text("f0.npz\n")

    cfg = cfg_lib._rep(cfg_lib.tiny_test(), model=dict(n_keypoints=20))
    plain = DepthKeypointDataset(cfg, str(manifest), augment=False)
    flipped = DepthKeypointDataset(cfg, str(manifest), augment=True, flip=True)
    flipped.rng = _AlwaysFlip()

    a = plain.get_example(0)["gt_keypoints"][0]  # (20,3) y,x,v at bucket scale
    b = flipped.get_example(0)["gt_keypoints"][0]
    idx = {n: k for k, n in enumerate(DEPTH_KEYPOINT_NAMES)}
    scale = plain.get_example(0)["scale"]
    w0s = 64 * scale

    li, ri = idx["HandLeft"], idx["HandRight"]
    np.testing.assert_allclose(b[li, 1], w0s - a[ri, 1], atol=1e-3)
    np.testing.assert_allclose(b[ri, 1], w0s - a[li, 1], atol=1e-3)
    np.testing.assert_allclose(b[li, 0], a[ri, 0], atol=1e-3)
    si = idx["SpineMid"]
    np.testing.assert_allclose(b[si, 1], w0s - a[si, 1], atol=1e-3)
