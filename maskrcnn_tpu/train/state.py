"""Train state, optimizer, and LR schedule.

Spec: reference optimizer setup — MomentumSGD(lr=1e-3, momentum=0.9) +
WeightDecay(5e-4) (reference train.py:107-109) and ExponentialShift('lr',
0.1) every 2 epochs (train.py:140) — expressed as optax transforms with a
step-decay schedule. Unlike the reference (which snapshots model params only,
train.py:134-137, losing LR-schedule position on restart — SURVEY §5),
``TrainState`` carries params + BN stats + optimizer state + step + PRNG so
checkpoint/resume is exact.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from maskrcnn_tpu.config import Config


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    key: jax.Array


def lr_schedule(cfg: Config):
    base = cfg.train.lr

    period = cfg.train.lr_decay_period

    def schedule(step):
        n_decays = step // period
        return base * (cfg.train.lr_decay_factor ** n_decays)

    return schedule


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # chainer WeightDecay adds wd·θ to the gradient BEFORE the momentum
    # update — same composition order here.
    return optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.sgd(learning_rate=lr_schedule(cfg), momentum=cfg.train.momentum,
                  accumulator_dtype=cfg.train.momentum_dtype),
    )


def create_train_state(cfg: Config, variables: dict, key: jax.Array) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        key=key,
    )
