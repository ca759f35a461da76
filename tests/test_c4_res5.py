"""C4 backbone + Res5 head end-to-end (per-class locs, single level).

Own file: the ResNet-50 train-step AND predict compiles are the two most
expensive in the suite — isolating them keeps every test file standalone
under a review window on a cold compilation cache."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.data import SyntheticDetectionData
from maskrcnn_tpu.eval import make_predict_fn
from maskrcnn_tpu.train import create_train_state, init_model, make_train_step

pytestmark = pytest.mark.slow


def test_c4_res5_train_and_predict():
    """The C4+Res5 config (per-class locs, single level) trains one step and
    predicts with finite outputs — exercises the per-class decode path."""
    cfg = cfg_lib.c4_res5()
    cfg = cfg_lib._rep(
        cfg,
        model=dict(n_fg_class=3),
        train=dict(batch_size=1, image_size=(128, 160), max_gt=4,
                   gt_mask_size=56),
        proposals=dict(n_train_pre_nms=256, n_train_post_nms=32,
                       n_test_pre_nms=128, n_test_post_nms=16),
        sampler=dict(n_sample=16),
        eval=dict(max_detections=8),
    )
    model, variables = init_model(cfg, jax.random.key(0))
    state = create_train_state(cfg, variables, jax.random.key(1))
    step = make_train_step(cfg, model)
    data = SyntheticDetectionData(cfg)
    state, metrics = step(state, jax.tree.map(jnp.asarray, data.batch(0)))
    assert np.isfinite(float(metrics["loss"]))

    predict = make_predict_fn(cfg, model)
    b = data.batch(1)
    det = predict({"params": state.params, "batch_stats": state.batch_stats},
                  jnp.asarray(b.images), jnp.asarray(b.img_hw),
                  jnp.asarray(b.scale))
    assert det.boxes.shape == (1, 8, 4)
    assert bool(jnp.isfinite(det.boxes).all())
    assert det.masks.shape[2:] == (14, 14)
