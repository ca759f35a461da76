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

    def test_flip_consistency(self, mini_coco):
        cfg = cfg_lib.tiny_test()
        loader = COCODetectionLoader(mini_coco, "val", cfg, flip=True, seed=3)
        # find a flipped example deterministically
        for _ in range(10):
            ex = loader.get_example(0)
            y0, x0, y1, x1 = ex["gt_boxes"][0]
            assert 0 <= x0 < x1 <= 160
            assert 0 <= y0 < y1 <= 128


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
