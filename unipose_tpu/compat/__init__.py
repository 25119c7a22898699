from unipose_tpu.compat.torch_convert import (  # noqa: F401
    convert_state_dict,
    load_torch_checkpoint,
    to_nchw,
    to_nhwc,
)
