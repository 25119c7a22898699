from unipose_tpu.ops.pallas.wasp_cascade import (  # noqa: F401
    fold_wasp_params,
    wasp_cascade,
)
