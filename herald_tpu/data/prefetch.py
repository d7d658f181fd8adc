"""Async host->device prefetch pipeline.

Replaces the reference dataloader's host-side ring buffer
(`python/hetu/dataloader.py:28-56`, queue_size ring of preloaded batches)
with its TPU analog: a background thread that stages upcoming batch chunks
on device (`jax.device_put` is async) while the current chunk trains, so
transfer overlaps compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np


class DevicePrefetcher:
    """Iterate device-staged chunks of a host dataset.

    chunks are tuples of arrays shaped [K, GB, ...] ready for the scanned
    executor. `sharding` (e.g. engine._kdata_sharding) places them; None
    keeps default device placement.
    """

    def __init__(self, arrays: Sequence[np.ndarray], steps_per_chunk: int,
                 global_batch: int, dtypes: Sequence, sharding=None,
                 depth: int = 2, drop_last: bool = True):
        self.arrays = [np.asarray(a) for a in arrays]
        self.K = steps_per_chunk
        self.gb = global_batch
        self.dtypes = list(dtypes)
        self.sharding = sharding
        n = len(self.arrays[0])
        chunk_samples = self.K * self.gb
        self.num_chunks = (n // chunk_samples if drop_last
                           else -(-n // chunk_samples))
        assert self.num_chunks >= 1, "not enough samples for one chunk"
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _stage(self, ci: int):
        lo = ci * self.K * self.gb
        out = []
        for a, dt in zip(self.arrays, self.dtypes):
            chunk = a[lo: lo + self.K * self.gb]
            if len(chunk) < self.K * self.gb:    # wrap the tail
                pad = self.K * self.gb - len(chunk)
                chunk = np.concatenate([chunk, a[:pad]])
            chunk = chunk.astype(dt).reshape(self.K, self.gb,
                                             *chunk.shape[1:])
            if self.sharding is not None:
                out.append(jax.device_put(chunk, self.sharding))
            else:
                out.append(jax.device_put(chunk))
        return tuple(out)

    def _worker(self, epochs: int):
        try:
            for _ in range(epochs):
                for ci in range(self.num_chunks):
                    if self._stop.is_set():
                        return
                    self._q.put(self._stage(ci))
        finally:
            self._q.put(None)

    def __call__(self, epochs: int = 1) -> Iterator:
        self._stop.clear()
        self._thread = threading.Thread(target=self._worker, args=(epochs,),
                                        daemon=True)
        self._thread.start()
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item

    def close(self):
        self._stop.set()
        if self._thread:
            while not self._q.empty():
                self._q.get_nowait()
