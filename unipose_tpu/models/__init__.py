from unipose_tpu.models.unipose import UniPose, build_model  # noqa: F401
from unipose_tpu.models.unipose_lstm import UniPoseLSTM  # noqa: F401
