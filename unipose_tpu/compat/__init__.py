from unipose_tpu.compat.export import export_inference, load_inference  # noqa: F401
from unipose_tpu.compat.torch_convert import (  # noqa: F401
    convert_state_dict,
    load_torch_checkpoint,
    to_nchw,
    to_nhwc,
)
