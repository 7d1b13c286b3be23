"""Host-DRAM master tables behind the cache.

Two implementations of one protocol (gather/scatter/num_rows/dim, plus the
lazy-device-init hooks written_mask/row_bounds/seed):

  * ``DenseHostTable`` — a materialized numpy array (hugepage-backed via the
    native allocator). The default for real datasets; what the reference does
    with its pinned CPU weight (/root/reference/benchmark/benchmark_fbgemm_uvm.py:104).
    When constructed with procedural metadata (the canonical per-row init),
    it tracks which rows have been written back so the cache can synthesize
    never-trained rows ON DEVICE instead of transferring them
    (ops/synth_rows.py).
  * ``VirtualHostTable`` — rows are generated procedurally (same canonical
    generator) until first written back, after which they live in a native
    hash-table overlay. Host memory = touched working set only, so a logical
    91 GB Criteo-1TB table (README.md:11) runs on any TPU-VM — used by
    benchmarks and capacity tests. Written-row tracking is the overlay's
    membership itself.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from cachedembedding_tpu._native import hostops


def table_bounds(table_sizes: Sequence[int]) -> np.ndarray:
    """Per-table U(-1/sqrt(n), 1/sqrt(n)) init bound (torchrec EmbeddingBagConfig
    default, used by the reference models' EBC path)."""
    return (np.asarray(table_sizes, np.float64) ** -0.5).astype(np.float32)


def row_bounds_of(table_offsets: np.ndarray, bounds: np.ndarray, idx: np.ndarray) -> np.ndarray:
    table = np.searchsorted(table_offsets, idx, side="right") - 1
    return bounds[np.clip(table, 0, len(bounds) - 1)]


class DenseHostTable:
    def __init__(
        self,
        array: np.ndarray,
        *,
        procedural_seed: Optional[int] = None,
        table_sizes: Optional[Sequence[int]] = None,
    ):
        assert array.ndim == 2
        self.array = array
        self.seed = procedural_seed
        if procedural_seed is not None:
            assert table_sizes is not None
            self.table_sizes = np.asarray(table_sizes, np.int64)
            self.table_offsets = np.concatenate([[0], np.cumsum(self.table_sizes)])
            self._bounds = table_bounds(table_sizes)
            # Rows whose host value differs from the canonical init (i.e. ever
            # written back). bool per row: 1 byte/row host DRAM.
            self._written = np.zeros((array.shape[0],), np.bool_)
        else:
            self._written = None

    @property
    def supports_device_init(self) -> bool:
        return self._written is not None

    @property
    def num_rows(self) -> int:
        return self.array.shape[0]

    @property
    def dim(self) -> int:
        return self.array.shape[1]

    def gather(self, idx: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
        return hostops.gather_rows(self.array, idx, out)

    def scatter(self, idx: np.ndarray, vals: np.ndarray) -> None:
        hostops.scatter_rows(self.array, idx, vals)
        if self._written is not None:
            self._written[idx] = True

    def written_mask(self, idx: np.ndarray) -> np.ndarray:
        return self._written[idx]

    def row_bounds(self, idx: np.ndarray) -> np.ndarray:
        return row_bounds_of(self.table_offsets, self._bounds, idx)

    def mark_all_written(self) -> None:
        """After restoring arbitrary values (checkpoint load), no row can be
        assumed to still hold its canonical init."""
        if self._written is not None:
            self._written[:] = True


class DenseAccumStore:
    """Host-DRAM per-row optimizer state (row-wise Adagrad accumulators) for a
    materialized table. The accumulator TIERS WITH THE CACHE: admitted rows
    carry their accumulator into HBM, evicted rows write it back — optimizer
    state for 90+ GB tables costs 4 bytes/row of host DRAM and (capacity,) of
    HBM. No reference analog (the reference is SGD-only)."""

    def __init__(self, num_rows: int, initial: float = 0.0):
        if hostops.native_available():
            self.arr = hostops.alloc_table(num_rows, 1).reshape(-1)  # zeroed mmap
            if initial:
                self.arr[:] = initial
        else:
            self.arr = np.full((num_rows,), initial, np.float32)
        self.initial = initial

    def gather(self, idx: np.ndarray) -> np.ndarray:
        return self.arr[idx]

    def scatter(self, idx: np.ndarray, vals: np.ndarray) -> None:
        self.arr[idx] = vals

    def save_state(self):
        return {"kind": "dense", "arr": self.arr}

    def mark_all_written(self) -> None:
        pass


class OverlayAccumStore:
    """Accumulator store for virtual tables: written rows live in a dim-1
    native overlay; unwritten rows default to ``initial`` (the canonical
    generator with bound 0 yields exactly -0.0, shifted by initial)."""

    def __init__(self, initial: float = 0.0, capacity_hint: int = 1 << 16):
        lib = hostops._load_lib()
        if lib is None:
            raise RuntimeError("OverlayAccumStore requires the native hostops lib")
        VirtualHostTable._ensure_proto()
        self._lib = lib
        self._h = lib.overlay_create(1, 0, capacity_hint)
        self.initial = float(initial)

    def gather(self, idx: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(idx, np.int64)
        out = np.empty((idx.shape[0], 1), np.float32)
        bounds = np.zeros((idx.shape[0],), np.float32)  # default row == 0
        self._lib.overlay_gather_f32(
            self._h, idx.ctypes.data, bounds.ctypes.data, out.ctypes.data, idx.shape[0]
        )
        out = out.reshape(-1)
        if self.initial:
            w = np.empty((idx.shape[0],), np.uint8)
            self._lib.overlay_contains(self._h, idx.ctypes.data, w.ctypes.data, idx.shape[0])
            out[~w.astype(bool)] = self.initial
        return out

    def scatter(self, idx: np.ndarray, vals: np.ndarray) -> None:
        idx = np.ascontiguousarray(idx, np.int64)
        vals = np.ascontiguousarray(vals, np.float32).reshape(-1, 1)
        self._lib.overlay_scatter_f32(self._h, idx.ctypes.data, vals.ctypes.data, idx.shape[0])

    def save_state(self):
        n = int(self._lib.overlay_used(self._h))
        rows = np.empty((n,), np.int64)
        if n:
            self._lib.overlay_keys(self._h, rows.ctypes.data)
        return {"kind": "overlay", "rows": rows, "vals": self.gather(rows)}

    def __del__(self):
        try:
            self._lib.overlay_free(self._h)
        except Exception:
            pass


class VirtualHostTable:
    def __init__(
        self,
        table_sizes: Sequence[int],
        dim: int,
        seed: int = 0,
        capacity_hint: int = 1 << 20,
    ):
        self.table_sizes = np.asarray(table_sizes, np.int64)
        self.table_offsets = np.concatenate([[0], np.cumsum(self.table_sizes)])
        self._num_rows = int(self.table_sizes.sum())
        self._dim = int(dim)
        self.seed = seed
        self._bounds = table_bounds(table_sizes)
        lib = hostops._load_lib()
        if lib is None:
            raise RuntimeError(
                "VirtualHostTable requires the native hostops library; "
                "build with: make -C cachedembedding_tpu/_native"
            )
        self._lib = lib
        self._ensure_proto()
        self._h = lib.overlay_create(dim, seed, capacity_hint)

    supports_device_init = True

    @classmethod
    def _ensure_proto(cls):
        lib = hostops._load_lib()
        if getattr(lib, "_overlay_proto_done", False):
            return
        lib.overlay_create.argtypes = [ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64]
        lib.overlay_create.restype = ctypes.c_void_p
        lib.overlay_free.argtypes = [ctypes.c_void_p]
        lib.overlay_used.argtypes = [ctypes.c_void_p]
        lib.overlay_used.restype = ctypes.c_int64
        lib.overlay_gather_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.overlay_scatter_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.overlay_contains.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.overlay_keys.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib._overlay_proto_done = True

    @property
    def num_rows(self) -> int:
        return self._num_rows

    @property
    def dim(self) -> int:
        return self._dim

    @property
    def overlay_rows(self) -> int:
        return int(self._lib.overlay_used(self._h))

    def row_bounds(self, idx: np.ndarray) -> np.ndarray:
        return row_bounds_of(self.table_offsets, self._bounds, idx)

    def gather(self, idx: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
        idx = np.ascontiguousarray(idx, np.int64)
        if out is None:
            out = np.empty((idx.shape[0], self._dim), np.float32)
        bounds = np.ascontiguousarray(self.row_bounds(idx), np.float32)
        self._lib.overlay_gather_f32(
            self._h, idx.ctypes.data, bounds.ctypes.data, out.ctypes.data, idx.shape[0]
        )
        return out

    def scatter(self, idx: np.ndarray, vals: np.ndarray) -> None:
        idx = np.ascontiguousarray(idx, np.int64)
        vals = np.ascontiguousarray(vals, np.float32)
        self._lib.overlay_scatter_f32(
            self._h, idx.ctypes.data, vals.ctypes.data, idx.shape[0]
        )

    def written_mask(self, idx: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(idx, np.int64)
        out = np.empty((idx.shape[0],), np.uint8)
        self._lib.overlay_contains(self._h, idx.ctypes.data, out.ctypes.data, idx.shape[0])
        return out.astype(np.bool_)

    def mark_all_written(self) -> None:
        raise NotImplementedError(
            "VirtualHostTable tracks written rows exactly; mark_all_written "
            "would defeat its memory model"
        )

    def written_rows(self) -> np.ndarray:
        """Row ids that have been written back (checkpointing support)."""
        n = self.overlay_rows
        out = np.empty((n,), np.int64)
        if n:
            self._lib.overlay_keys(self._h, out.ctypes.data)
        return out

    def __del__(self):
        try:
            self._lib.overlay_free(self._h)
        except Exception:
            pass
