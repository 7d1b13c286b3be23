"""Device-synchronized timing utilities (analog of the CUDA-synced Timer and
get_time_elapsed context, /root/reference/recsys/utils/misc.py:37-135)."""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax


def device_sync() -> None:
    """Block until all dispatched device work completes (the TPU analog of
    torch.cuda.synchronize). A fresh transfer acts as a barrier because device
    execution is in-order per stream; callers that need exact timing should
    block_until_ready on their own outputs instead."""
    jax.block_until_ready(jax.device_put(0))


class Timer:
    def __init__(self, sync: bool = True):
        self._sync = sync
        self._history: List[float] = []
        self._start: Optional[float] = None

    def start(self) -> None:
        if self._sync:
            device_sync()
        self._start = time.perf_counter()

    def stop(self, keep_in_history: bool = True) -> float:
        if self._sync:
            device_sync()
        assert self._start is not None
        el = time.perf_counter() - self._start
        if keep_in_history:
            self._history.append(el)
        self._start = None
        return el

    @property
    def history(self) -> List[float]:
        return self._history

    def mean(self, skip: int = 0) -> float:
        h = self._history[skip:]
        return sum(h) / len(h) if h else 0.0

    def reset(self) -> None:
        self._history.clear()
        self._start = None


@contextlib.contextmanager
def get_time_elapsed(logger, message: str):
    t = Timer()
    t.start()
    yield
    el = t.stop()
    logger.info(f"{message}, time elapsed: {el:.4f}s")
