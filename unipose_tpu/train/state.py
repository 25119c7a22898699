"""Train state: params + BN running stats + optimizer state + step + rng.

Unlike the reference checkpoint (state_dict only, no optimizer/epoch/RNG —
utils/utils.py:53-56, so no true resume), this state is complete: saving and
restoring it resumes training exactly.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import struct

from unipose_tpu.core.config import ModelConfig, TrainConfig
from unipose_tpu.models.unipose import init_model
from unipose_tpu.train.optim import make_optimizer


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def create_train_state(
    model_config: ModelConfig,
    train_config: TrainConfig,
    rng: jax.Array,
    input_size: int = None,
    bn_groups: int = 1,
):
    """Returns (model, optimizer, TrainState).

    ``bn_groups`` > 1 builds the model with per-group (ghost) BatchNorm
    statistics — the realization of ``ModelConfig.sync_bn=False`` under data
    parallelism (see Trainer.__init__ and TorchBatchNorm.stat_groups)."""
    import jax.numpy as jnp

    init_rng, state_rng = jax.random.split(rng)
    model, variables = init_model(
        model_config, init_rng, input_size=input_size, bn_groups=bn_groups
    )
    tx = make_optimizer(train_config)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        rng=state_rng,
    )
    return model, tx, state
