from unipose_tpu.data import transforms  # noqa: F401
from unipose_tpu.data.loader import PrefetchLoader, get_dataloader  # noqa: F401
from unipose_tpu.data.lsp import LSPDataset  # noqa: F401
from unipose_tpu.data.mpii import MPIIDataset  # noqa: F401
from unipose_tpu.data.penn_action import PennActionDataset  # noqa: F401
from unipose_tpu.data.bbc import BBCDataset  # noqa: F401
