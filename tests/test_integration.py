"""Real-data end-to-end: the full CLI path over a REAL COCO-schema dataset
on disk — train → checkpoint → resume (exact equivalence) → eval nonzero mAP.

This proves the real-data path the reference exercises via train.py:111-129
(COCOMaskLoader → Transform → Trainer), which loader unit tests alone do not:
JSON parsing, JPEG decode, polygon rasterization, padding, the jitted train
step, full-state orbax checkpoints, step-pure data resume, and the two-pass
predict + VOC mAP evaluator, all through ``cli/train.py``.
"""

import json
import os
import shutil

import numpy as np
import pytest

from maskrcnn_tpu import config as cfg_lib

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def learnable_coco(tmp_path_factory):
    """A real-schema COCO dir whose content is learnable in ~30 tiny steps:
    bright class-colored rectangles on dark backgrounds."""
    import cv2

    root = tmp_path_factory.mktemp("coco_e2e")
    (root / "annotations").mkdir()
    (root / "val").mkdir()

    rng = np.random.RandomState(0)
    images, annotations = [], []
    colors = {7: (220, 40, 40), 21: (40, 40, 220)}  # cat=red, dog=blue
    aid = 1
    for i in range(6):
        h0, w0 = 96, 128
        img = rng.randint(0, 30, (h0, w0, 3)).astype(np.uint8)
        cat = 7 if i % 2 == 0 else 21
        x = int(rng.randint(5, 60))
        y = int(rng.randint(5, 40))
        w = int(rng.randint(35, 60))
        hh = int(rng.randint(30, 48))
        img[y:y + hh, x:x + w] = colors[cat]
        name = f"{i:06d}.jpg"
        cv2.imwrite(str(root / "val" / name),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        images.append({"id": 100 + i, "file_name": name,
                       "height": h0, "width": w0})
        annotations.append({
            "id": aid, "image_id": 100 + i, "category_id": cat,
            "bbox": [x, y, w, hh], "area": w * hh, "iscrowd": 0,
            "segmentation": [[x, y, x + w, y, x + w, y + hh, x, y + hh]],
        })
        aid += 1
    with open(root / "annotations" / "instances_val.json", "w") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 7, "name": "cat"}, {"id": 21, "name": "dog"}],
        }, f)
    return str(root)


def _run_cli(out, coco_root, iterations, extra=()):
    from cli.train import main

    main([
        "--preset", "tiny_test", "--dataset", "coco",
        "--coco-root", coco_root, "--coco-split", "val",
        "--out", out, "--iterations", str(iterations),
        "--snapshot-every", "16", "--log-every", "16", "--seed", "7",
        *extra,
    ])


def test_train_resume_eval_end_to_end(learnable_coco, tmp_path):
    import jax

    from maskrcnn_tpu.data.coco import COCODetectionLoader
    from maskrcnn_tpu.eval.evaluator import evaluate_dataset
    from maskrcnn_tpu.train import create_train_state, init_model
    from maskrcnn_tpu.train.checkpoint import restore_checkpoint

    out_full = str(tmp_path / "full")
    out_resumed = str(tmp_path / "resumed")

    # uninterrupted run: 0 → 32, checkpoints at 16 and 32
    _run_cli(out_full, learnable_coco, 32)
    assert os.path.isdir(os.path.join(out_full, "checkpoints", "step_00000016"))
    assert os.path.isdir(os.path.join(out_full, "checkpoints", "step_00000032"))
    # the CLI persisted its effective config (save_args equivalent)
    with open(os.path.join(out_full, "args.json")) as f:
        assert json.load(f)["config"]["train"]["epoch_size"] == 6

    # interrupted run: copy ONLY the step-16 checkpoint, resume → 32
    os.makedirs(os.path.join(out_resumed, "checkpoints"))
    shutil.copytree(
        os.path.join(out_full, "checkpoints", "step_00000016"),
        os.path.join(out_resumed, "checkpoints", "step_00000016"),
    )
    _run_cli(out_resumed, learnable_coco, 32, extra=("--resume",))

    # exact resume: identical final state (params, opt state, PRNG, step)
    cfg = cfg_lib.tiny_test()
    model, variables = init_model(cfg, jax.random.key(7))
    template = create_train_state(cfg, variables, jax.random.key(8))
    s_full = restore_checkpoint(
        os.path.join(out_full, "checkpoints", "step_00000032"), template)
    s_res = restore_checkpoint(
        os.path.join(out_resumed, "checkpoints", "step_00000032"), template)
    def leaves(state):
        out = []
        for x in jax.tree.leaves(state):
            if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key
            ):
                x = jax.random.key_data(x)
            out.append(np.asarray(x))
        return out

    flat_a, flat_b = leaves(s_full), leaves(s_res)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)

    # eval the trained model over the real-data loader: nonzero mask mAP
    loader = COCODetectionLoader(learnable_coco, "val", cfg, flip=False,
                                 seed=7)
    report = evaluate_dataset(
        cfg, model,
        {"params": s_full.params, "batch_stats": s_full.batch_stats},
        iter(loader), 3,
    )
    assert report["map"] > 0.0, report

    # COCO results export: loadRes-compatible JSON in ORIGINAL image
    # coordinates with the annotation file's sparse category ids
    from maskrcnn_tpu.data.coco import rle_decode
    from maskrcnn_tpu.eval.export import export_coco_results

    res_path = str(tmp_path / "results.json")
    n_res = export_coco_results(
        cfg, model,
        {"params": s_full.params, "batch_stats": s_full.batch_stats},
        loader, res_path,
    )
    with open(res_path) as f:
        results = json.load(f)
    assert len(results) == n_res > 0
    valid_ids = set(loader.ids)
    for r in results:
        assert r["image_id"] in valid_ids
        assert r["category_id"] in (7, 21)  # the fixture's sparse cat ids
        h, w = r["segmentation"]["size"]
        assert (h, w) == (96, 128)  # ORIGINAL resolution, not the bucket
        m = rle_decode(r["segmentation"])
        assert m.shape == (96, 128)
        x, y, bw_, bh_ = r["bbox"]
        assert 0 <= x <= 128 and 0 <= y <= 96 and bw_ >= 0 and bh_ >= 0
