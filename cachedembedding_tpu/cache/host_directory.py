"""Host-authoritative cache directory — the native planner behind prepare_ids.

This is the default planner for ``CachedEmbeddingBag`` on real hardware. All
cache *bookkeeping* (unique over the id stream, hit/miss split, LFU or
dataset-frequency victim selection, id->slot remap) runs in multithreaded C++
on the TPU-VM host (``_native/directory.cpp``), while the device only executes
dense work (row scatter/gather, lookup, train math). Two wins over a
device-side planner:

  1. zero device->host readbacks on the critical path (a synchronous readback
     costs a full RTT, ~70 ms on tunneled links; the reference instead pays
     CUDA sync + eager tensor ops, /root/reference/recsys/dlrm_main.py:259);
  2. the plan for window k+1 is computed on host CPUs *while* the device is
     executing window k — directory time is fully hidden.

Semantics match the jitted device planner (``cache.state.plan_ids``), which is
kept for comparison and for tests; equivalence is property-tested in
tests/test_host_directory.py.

There is also a pure-Python fallback (``PyDirectory``) for environments
without the native library.
"""

from __future__ import annotations

import ctypes
from typing import NamedTuple, Optional

import numpy as np

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.cache.state import EvictionStrategy


class HostPlan(NamedTuple):
    """Result of one directory window (already-applied state transition)."""

    slot_ids: np.ndarray    # (L,) int32 — ids remapped to cache-slot space
    admit_rows: np.ndarray  # (n_miss,) int64 — rows to copy host->HBM
    admit_slots: np.ndarray  # (n_miss,) int32 — destination slots
    evict_rows: np.ndarray  # (n_miss,) int64 — previous occupants (-1 = empty)
    n_unique: int
    n_hit_unique: int
    n_hit_weighted: int
    n_ids: int


def _proto_done(lib) -> bool:
    return getattr(lib, "_dir_proto_done", False)


def _ensure_proto(lib) -> None:
    if _proto_done(lib):
        return
    lib.dir_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    lib.dir_create.restype = ctypes.c_void_p
    lib.dir_free.argtypes = [ctypes.c_void_p]
    lib.dir_set_dataset_freq.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.dir_warmup.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.dir_plan.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.dir_plan.restype = ctypes.c_int64
    lib.dir_resident.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.dir_resident.restype = ctypes.c_int64
    lib.dir_lookup.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.dir_lookup.restype = ctypes.c_int32
    lib.dir_num_free.argtypes = [ctypes.c_void_p]
    lib.dir_num_free.restype = ctypes.c_int64
    lib._dir_proto_done = True


class CapacityError(RuntimeError):
    pass


class HostDirectory:
    """ctypes wrapper over the native directory."""

    def __init__(
        self,
        num_rows: int,
        capacity: int,
        strategy: EvictionStrategy = EvictionStrategy.LFU,
    ):
        lib = hostops._load_lib()
        if lib is None:
            raise RuntimeError(
                "HostDirectory requires the native hostops library; build with "
                "`make -C cachedembedding_tpu/_native` or use PyDirectory."
            )
        _ensure_proto(lib)
        self._lib = lib
        self.num_rows = int(num_rows)
        self.capacity = int(capacity)
        self.strategy = strategy
        self._h = lib.dir_create(
            self.num_rows, self.capacity, 0 if strategy == EvictionStrategy.LFU else 1
        )
        # reusable plan output buffers
        self._admit_rows = np.empty((self.capacity,), np.int64)
        self._admit_slots = np.empty((self.capacity,), np.int32)
        self._evict_rows = np.empty((self.capacity,), np.int64)
        self._stats = np.empty((6,), np.int64)

    def set_dataset_freq(self, freq: np.ndarray) -> None:
        freq = np.ascontiguousarray(freq, np.int64)
        assert freq.shape == (self.num_rows,)
        self._lib.dir_set_dataset_freq(self._h, freq.ctypes.data)

    def warmup(self, rows: np.ndarray, freqs: np.ndarray) -> None:
        rows = np.ascontiguousarray(rows, np.int64)
        freqs = np.ascontiguousarray(freqs, np.int64)
        assert rows.shape == freqs.shape and rows.shape[0] <= self.capacity
        self._lib.dir_warmup(self._h, rows.ctypes.data, freqs.ctypes.data, rows.shape[0])

    def plan(self, ids: np.ndarray, out_slot_ids: Optional[np.ndarray] = None) -> HostPlan:
        ids = np.ascontiguousarray(ids, np.int32)
        L = ids.shape[0]
        if out_slot_ids is not None:
            # the native dir_plan writes L int32 through the raw pointer — an
            # undersized/non-contiguous/wrong-dtype buffer would corrupt the
            # heap silently (PyDirectory's slice assignment raises instead)
            if (
                out_slot_ids.dtype != np.int32
                or out_slot_ids.size < L
                or not out_slot_ids.flags.c_contiguous
            ):
                raise ValueError(
                    "out_slot_ids must be a C-contiguous int32 buffer with "
                    f">= {L} elements"
                )
        slot_ids = out_slot_ids if out_slot_ids is not None else np.empty((L,), np.int32)
        n_miss = self._lib.dir_plan(
            self._h, ids.ctypes.data, L, slot_ids.ctypes.data,
            self._admit_rows.ctypes.data, self._admit_slots.ctypes.data,
            self._evict_rows.ctypes.data, self._stats.ctypes.data,
        )
        s = self._stats
        if n_miss < 0:
            if s[5] == 2:
                raise ValueError(
                    f"id out of range at position {s[1]}: {s[2]} not in "
                    f"[0, {self.num_rows}) — check table-size/hash configuration"
                )
            raise CapacityError(
                f"cache capacity exhausted: working set needs {s[0]} new slots on "
                f"top of {s[2]} protected hits but capacity is {self.capacity}. "
                f"Reduce prefetch_num/batch or raise cache_ratio."
            )
        return HostPlan(
            slot_ids=slot_ids,
            admit_rows=self._admit_rows[:n_miss].copy(),
            admit_slots=self._admit_slots[:n_miss].copy(),
            evict_rows=self._evict_rows[:n_miss].copy(),
            n_unique=int(s[1]),
            n_hit_unique=int(s[2]),
            n_hit_weighted=int(s[3]),
            n_ids=L,
        )

    def resident(self) -> tuple[np.ndarray, np.ndarray]:
        """(slots, rows) of every resident row — for flush/checkpoint."""
        slots = np.empty((self.capacity,), np.int32)
        rows = np.empty((self.capacity,), np.int64)
        n = self._lib.dir_resident(self._h, slots.ctypes.data, rows.ctypes.data)
        return slots[:n], rows[:n]

    def lookup(self, row: int) -> int:
        return int(self._lib.dir_lookup(self._h, int(row)))

    @property
    def num_free(self) -> int:
        return int(self._lib.dir_num_free(self._h))

    def __del__(self):
        try:
            self._lib.dir_free(self._h)
        except Exception:
            pass


class PyDirectory:
    """Numpy fallback with identical semantics (slow; tests / no-native envs)."""

    def __init__(
        self,
        num_rows: int,
        capacity: int,
        strategy: EvictionStrategy = EvictionStrategy.LFU,
    ):
        self.num_rows = int(num_rows)
        self.capacity = int(capacity)
        self.strategy = strategy
        self.row_to_slot = np.full((num_rows,), -1, np.int32)
        self.slot_to_row = np.full((capacity,), -1, np.int64)
        self.slot_freq = np.zeros((capacity,), np.int64)
        self.free_slots = list(range(capacity - 1, -1, -1))
        self.dataset_freq: Optional[np.ndarray] = None

    def set_dataset_freq(self, freq: np.ndarray) -> None:
        self.dataset_freq = np.ascontiguousarray(freq, np.int64)

    def warmup(self, rows: np.ndarray, freqs: np.ndarray) -> None:
        k = rows.shape[0]
        self.free_slots = list(range(self.capacity - 1, k - 1, -1))
        self.slot_to_row[:k] = rows
        self.row_to_slot[rows] = np.arange(k, dtype=np.int32)
        self.slot_freq[:k] = freqs

    def plan(self, ids: np.ndarray, out_slot_ids: Optional[np.ndarray] = None) -> HostPlan:
        ids = np.ascontiguousarray(ids, np.int32)
        if ids.size and (int(ids.min()) < 0 or int(ids.max()) >= self.num_rows):
            # Same contract as the native dir_plan: negative ids would silently
            # index row_to_slot from the end and corrupt directory state.
            raise ValueError(
                f"ids out of range [0, {self.num_rows}): "
                f"min={int(ids.min())}, max={int(ids.max())}"
            )
        uids, counts = np.unique(ids, return_counts=True)
        slots = self.row_to_slot[uids]
        hit = slots >= 0
        miss_rows = uids[~hit]
        n_miss = miss_rows.shape[0]
        protected = np.zeros((self.capacity,), bool)
        protected[slots[hit]] = True

        from_free = min(n_miss, len(self.free_slots))
        need = n_miss - from_free
        victims = np.empty((n_miss,), np.int32)
        evict_rows = np.full((n_miss,), -1, np.int64)
        if need > 0:
            # capacity check BEFORE mutating free_slots: raising after popping
            # would leak the popped slots (neither free nor assigned) and
            # permanently shrink effective capacity for a caller that catches
            # CapacityError and retries smaller
            occupied = (self.slot_to_row >= 0) & ~protected
            cand = np.nonzero(occupied)[0]
            if cand.shape[0] < need:
                raise CapacityError("cache capacity exhausted")
        for k in range(from_free):
            victims[k] = self.free_slots.pop()
        if need > 0:
            order = np.argsort(self.slot_freq[cand], kind="stable")
            chosen = cand[order[:need]]
            victims[from_free:] = chosen
            evict_rows[from_free:] = self.slot_to_row[chosen]
            self.row_to_slot[self.slot_to_row[chosen]] = -1

        self.slot_to_row[victims] = miss_rows
        self.row_to_slot[miss_rows] = victims
        miss_counts = counts[~hit]
        if self.strategy == EvictionStrategy.LFU:
            self.slot_freq[victims] = miss_counts
            self.slot_freq[slots[hit]] += counts[hit]
        else:
            df = self.dataset_freq
            self.slot_freq[victims] = 0 if df is None else df[miss_rows]

        slot_ids = self.row_to_slot[ids]
        if out_slot_ids is not None:
            out_slot_ids[:] = slot_ids
            slot_ids = out_slot_ids
        return HostPlan(
            slot_ids=slot_ids,
            admit_rows=miss_rows.astype(np.int64),
            admit_slots=victims,
            evict_rows=evict_rows,
            n_unique=int(uids.shape[0]),
            n_hit_unique=int(hit.sum()),
            n_hit_weighted=int(counts[hit].sum()),
            n_ids=int(ids.shape[0]),
        )

    def resident(self) -> tuple[np.ndarray, np.ndarray]:
        slots = np.nonzero(self.slot_to_row >= 0)[0].astype(np.int32)
        return slots, self.slot_to_row[slots]

    def lookup(self, row: int) -> int:
        return int(self.row_to_slot[row])

    @property
    def num_free(self) -> int:
        return len(self.free_slots)


def make_directory(num_rows: int, capacity: int, strategy: EvictionStrategy):
    if hostops.native_available():
        return HostDirectory(num_rows, capacity, strategy)
    return PyDirectory(num_rows, capacity, strategy)
