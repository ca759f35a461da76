"""Config / LR-schedule semantics (fast tier).

Reference semantics: ExponentialShift('lr', 0.1) triggered every 2 EPOCHS
(reference train.py:140), 3 epochs for keypoints (train_keypoints.py:158).
The rebuild trains batched, so the step period must scale with batch_size —
VERDICT round-1 weak #8 flagged the old fixed 120k-iteration period silently
becoming ~16 epochs at batch 8.
"""

import numpy as np

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.train import lr_schedule


class TestLRDecayPeriod:
    def test_scales_with_batch_size(self):
        cfg = cfg_lib.fpn_mask()
        cfg1 = cfg_lib._rep(cfg, train=dict(batch_size=1, epoch_size=80_000))
        cfg8 = cfg_lib._rep(cfg, train=dict(batch_size=8, epoch_size=80_000))
        assert cfg1.train.lr_decay_period == 160_000
        assert cfg8.train.lr_decay_period == 20_000
        # same number of EPOCHS before first decay regardless of batch size
        assert (cfg1.train.lr_decay_period * 1
                == cfg8.train.lr_decay_period * 8)

    def test_explicit_iteration_override_wins(self):
        cfg = cfg_lib._rep(
            cfg_lib.fpn_mask(),
            train=dict(batch_size=8, lr_decay_every_iters=5000),
        )
        assert cfg.train.lr_decay_period == 5000

    def test_keypoint_presets_decay_every_3_epochs(self):
        assert cfg_lib.fpn_keypoint().train.lr_decay_every_epochs == 3.0
        assert cfg_lib.darknet_keypoint().train.lr_decay_every_epochs == 3.0

    def test_schedule_steps_down_at_period(self):
        cfg = cfg_lib._rep(
            cfg_lib.fpn_mask(),
            train=dict(lr=1e-3, batch_size=4, epoch_size=100,
                       lr_decay_every_epochs=2.0),
        )
        period = cfg.train.lr_decay_period  # 100*2/4 = 50
        assert period == 50
        sched = lr_schedule(cfg)
        np.testing.assert_allclose(float(sched(0)), 1e-3)
        np.testing.assert_allclose(float(sched(period - 1)), 1e-3)
        np.testing.assert_allclose(float(sched(period)), 1e-4)
        np.testing.assert_allclose(float(sched(3 * period)), 1e-6, rtol=1e-5)


class TestPresets:
    def test_all_presets_construct(self):
        for name, fn in cfg_lib.PRESETS.items():
            cfg = fn()
            assert cfg.model.n_class == cfg.model.n_fg_class + 1, name

    def test_use_preset_parity(self):
        cfg = cfg_lib.use_preset(cfg_lib.fpn_mask(), "evaluate")
        assert cfg.eval.score_thresh == 0.05 and cfg.eval.nms_thresh == 0.3
        cfg = cfg_lib.use_preset(cfg_lib.fpn_mask(), "visualize")
        assert cfg.eval.score_thresh == 0.7


def test_apply_overrides_typing(tmp_path):
    """--set strings type themselves from the field's current value."""
    from maskrcnn_tpu import config as cfg_lib

    cfg = cfg_lib.PRESETS["fpn_mask"]()
    out = cfg_lib.apply_overrides(cfg, [
        "model.freeze_bn=False",
        "train.image_size=256x320",
        "proposals.nms_thresh=0.5",
        "sampler.n_sample=128",
    ])
    assert out.model.freeze_bn is False
    assert out.train.image_size == (256, 320)
    assert abs(out.proposals.nms_thresh - 0.5) < 1e-9
    assert out.sampler.n_sample == 128
    # bad key raises instead of silently ignoring
    import pytest

    with pytest.raises(AttributeError):
        cfg_lib.apply_overrides(cfg, ["model.no_such_field=1"])


def test_metric_logger_validation_rows(tmp_path):
    """In-train eval results land in the JSONL under validation/main/*
    (round-4 lesson: a 0.0-AP run was invisible in its own log)."""
    import json

    from maskrcnn_tpu.utils import MetricLogger

    lg = MetricLogger(str(tmp_path), print_every=100)
    lg.log(1, {"loss": 1.0}, n_images=2, lr=0.1)
    lg.log_validation(1, {"map": 0.5, "coco/map": 0.25, "skip": "str"})
    lg.close()
    rows = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
    val = [r for r in rows if "validation/main/map" in r]
    assert val and val[0]["validation/main/coco/map"] == 0.25
    assert "validation/main/skip" not in val[0]
