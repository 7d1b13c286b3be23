"""Background-thread batch prefetcher — the stream-dataloader analog
(/root/reference/recsys/utils/dataloader/cuda_stream_dataloader.py:11-83
CudaStreamDataIter / FiniteDataIter, which overlap the H2D copy of the next
batch with compute on a side CUDA stream).

On TPU there is no user-managed stream; JAX transfers are already async, so
the equivalent concern is HOST-side batch construction latency (npy slicing,
parquet decode, id hashing). ``PrefetchIterator`` runs the upstream iterator
on a worker thread with a bounded queue so batch k+depth materializes while
the trainer consumes batch k. The trainer's own window pipeline then overlaps
the device transfer."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

from cachedembedding_tpu.jagged import Batch


class PrefetchIterator:
    _SENTINEL = object()

    def __init__(self, source: Iterable[Batch], depth: int = 2):
        self.source = source
        self.depth = max(1, depth)

    def __iter__(self) -> Iterator[Batch]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []

        def worker():
            try:
                for item in self.source:
                    q.put(item)
            except BaseException as e:  # surface upstream failures to the consumer
                err.append(e)
            finally:
                q.put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


class FiniteDataIter:
    """Reference-API alias (/root/reference/recsys/utils/dataloader/
    cuda_stream_dataloader.py:50): a bounded prefetching iterator over a
    finite dataset."""

    def __init__(self, source: Iterable[Batch], depth: int = 2):
        self._it = iter(PrefetchIterator(source, depth=depth))

    def __iter__(self):
        return self._it

    def __next__(self) -> Batch:
        return next(self._it)
