"""Optimizer and LR schedule.

Reference recipe: Adam(lr=1e-4) with MSE loss (unipose.py:70-72) and a
step-decay schedule ``lr = base * gamma^(iters // step_size)`` with
gamma=0.333, step_size=13275 applied every iteration
(utils/utils.py:42-51, unipose.py:51-52,107).  optax's staircase exponential
decay is exactly that policy; optax.adam matches torch.optim.Adam's update
(betas (0.9, 0.999), eps 1e-8 added after the sqrt).
"""

from __future__ import annotations

import jax
import optax

from unipose_tpu.core.config import TrainConfig


def step_decay_schedule(
    base_lr: float, gamma: float, step_size: int, warmup_steps: int = 0
):
    decay = optax.exponential_decay(
        init_value=base_lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )
    if warmup_steps <= 0:
        return decay
    # Linear 0 -> base_lr ramp ahead of the staircase (TrainConfig.warmup_steps
    # rationale: the video head's output-ReLU dead-channel trap).
    warmup = optax.linear_schedule(
        init_value=0.0, end_value=base_lr, transition_steps=warmup_steps
    )
    return optax.join_schedules([warmup, decay], boundaries=[warmup_steps])


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    schedule = step_decay_schedule(
        config.lr, config.gamma, config.step_size, config.warmup_steps
    )
    return optax.adam(schedule)


def make_optimizer_with_lr_groups(
    config: TrainConfig, backbone_key: str = "backbone", head_multiple: float = 10.0
) -> optax.GradientTransformation:
    """Differential LR: backbone at 1x, everything else at ``head_multiple``x.

    This is the *intended* behavior of the reference's ``get_1x_lr_params`` /
    ``get_10x_lr_params`` (model/unipose.py:47-65 — broken there: it
    references an undefined ``self.aspp`` and the trainer never calls it,
    using a single Adam group instead).  Exposed as an opt-in.
    """

    def label_tree(params):
        return {
            k: jax.tree_util.tree_map(
                lambda _: "backbone" if k == backbone_key else "head", v
            )
            for k, v in params.items()
        }

    sched = step_decay_schedule(config.lr, config.gamma, config.step_size)
    head_sched = step_decay_schedule(
        config.lr * head_multiple, config.gamma, config.step_size
    )
    return optax.multi_transform(
        {"backbone": optax.adam(sched), "head": optax.adam(head_sched)},
        label_tree,
    )
