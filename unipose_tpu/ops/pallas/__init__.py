from unipose_tpu.ops.pallas.heatmap_loss import heatmap_mse  # noqa: F401
from unipose_tpu.ops.pallas.stem import fold_stem_params, fused_stem  # noqa: F401
from unipose_tpu.ops.pallas.wasp_cascade import (  # noqa: F401
    fold_wasp_params,
    wasp_cascade,
)
