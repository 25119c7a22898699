from unipose_tpu.eval.metrics import (  # noqa: F401
    accuracy,
    calc_dists,
    dist_acc,
    get_max_preds,
    get_max_preds_device,
)
from unipose_tpu.eval.report import print_accuracies  # noqa: F401
from unipose_tpu.eval.video import stream_video  # noqa: F401
