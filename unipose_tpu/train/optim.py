"""Optimizer and LR schedule.

Reference recipe: Adam(lr=1e-4) with MSE loss (unipose.py:70-72) and a
step-decay schedule ``lr = base * gamma^(iters // step_size)`` with
gamma=0.333, step_size=13275 applied every iteration
(utils/utils.py:42-51, unipose.py:51-52,107).  optax's staircase exponential
decay is exactly that policy; optax.adam matches torch.optim.Adam's update
(betas (0.9, 0.999), eps 1e-8 added after the sqrt).
"""

from __future__ import annotations

import optax

from unipose_tpu.core.config import TrainConfig


def step_decay_schedule(base_lr: float, gamma: float, step_size: int):
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = step_decay_schedule(config.lr, config.gamma, config.step_size)
    return optax.adam(schedule)
