"""Batch image loader on the native C++ decode core.

For inference/eval pipelines (no geometric augmentation): decodes whole
batches with the C++ thread pool (``unipose_tpu.native``) and double-buffers
the next batch while the device consumes the current one.  Per-sample Python
work drops to zero; metadata arrays (keypoints, centers) are sliced
vectorized.

Use for: LSP/MPII val loops, BBC eval (``bottom_right=368`` reproduces
bbc_data.py:169's crop), and serving.  Augmented training paths keep the
Python transforms (joint-aware geometry needs per-sample logic).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from unipose_tpu import native


class NativeImageLoader:
    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        *,
        size: int = 368,
        bottom_right: int = 0,
        meta: Optional[Dict[str, np.ndarray]] = None,
        n_threads: int = 0,
        drop_last: bool = False,
    ):
        if not native.available():
            raise RuntimeError("native decoder unavailable")
        self.paths = list(paths)
        self.batch_size = int(batch_size)
        self.size = size
        self.bottom_right = bottom_right
        self.meta = meta or {}
        for k, v in self.meta.items():
            assert len(v) == len(self.paths), f"meta {k!r} length mismatch"
        self.n_threads = n_threads
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.paths)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _decode(self, start: int) -> Dict[str, np.ndarray]:
        stop = min(start + self.batch_size, len(self.paths))
        batch_paths = self.paths[start:stop]
        images, statuses = native.decode_batch(
            batch_paths,
            self.size,
            bottom_right=self.bottom_right,
            n_threads=self.n_threads,
        )
        # previous-frame fallback for unreadable files (bbc_data.py:162-165)
        for i in np.nonzero(statuses)[0]:
            if start + i > 0:
                prev, _ = native.decode_batch(
                    [self.paths[start + i - 1]],
                    self.size,
                    bottom_right=self.bottom_right,
                )
                images[i] = prev[0]
        out = {"image": images, "path": batch_paths}
        for k, v in self.meta.items():
            out[k] = np.asarray(v[start:stop])
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n_batches = len(self)
        starts = [i * self.batch_size for i in range(n_batches)]
        if not starts:
            return
        with cf.ThreadPoolExecutor(1) as pool:
            fut = pool.submit(self._decode, starts[0])
            for i in range(n_batches):
                batch = fut.result()
                if i + 1 < n_batches:
                    fut = pool.submit(self._decode, starts[i + 1])
                yield batch
