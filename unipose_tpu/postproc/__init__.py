from unipose_tpu.postproc.multi_person import detect_peaks, multi_person_kpts  # noqa: F401
from unipose_tpu.postproc.nms import bbox_iou, non_max_suppression  # noqa: F401
