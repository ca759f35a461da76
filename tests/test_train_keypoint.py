"""Keypoint-head train step (own full-model compile — see
test_train_variants.py docstring for the per-file compile budget)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maskrcnn_tpu import config as cfg_lib
from maskrcnn_tpu.data import SyntheticDetectionData
from maskrcnn_tpu.train import create_train_state, init_model, make_train_step

pytestmark = pytest.mark.slow


def test_keypoint_step_runs():
    cfg = cfg_lib.darknet_keypoint(n_keypoints=8)
    # shrink to test scale
    cfg = cfg_lib._rep(
        cfg,
        train=dict(batch_size=2, image_size=(128, 160), max_gt=4,
                   gt_mask_size=56),
        proposals=dict(n_train_pre_nms=256, n_train_post_nms=32),
        sampler=dict(n_sample=16),
    )
    model, variables = init_model(cfg, jax.random.key(0))
    state = create_train_state(cfg, variables, jax.random.key(1))
    step = make_train_step(cfg, model)
    data = SyntheticDetectionData(cfg)
    state, metrics = step(state, jax.tree.map(jnp.asarray, data.batch(0)))
    for name, v in metrics.items():
        assert np.isfinite(float(v)), f"{name} not finite"
