from unipose_tpu.ops.resize import bilinear_resize, resize_matrix  # noqa: F401
from unipose_tpu.ops.pooling import (  # noqa: F401
    avg_pool2d,
    max_pool2d,
)
from unipose_tpu.ops.heatmap import (  # noqa: F401
    gaussian_heatmaps,
    gaussian_kernel,
    render_targets,
)
