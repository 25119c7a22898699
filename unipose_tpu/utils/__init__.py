from unipose_tpu.utils.meters import AverageMeter  # noqa: F401
from unipose_tpu.utils.logger import Logger  # noqa: F401
from unipose_tpu.utils.summary import model_summary  # noqa: F401
