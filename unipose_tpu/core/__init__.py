from unipose_tpu.core.config import (  # noqa: F401
    DatasetSpec,
    ModelConfig,
    TrainConfig,
    DATASETS,
    PRESETS,
    get_preset,
)
