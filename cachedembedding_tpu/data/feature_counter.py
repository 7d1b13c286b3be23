"""Id-frequency counting — feeds cache warmup and DATASET eviction
(/root/reference/recsys/datasets/feature_counter.py:11-60,
/root/reference/recsys/datasets/criteo.py:461-486).

``GlobalFeatureCounter``: streaming bincount over npy sparse shards in the fused
global id space (after %hash + offset). ``get_id_freq_map``: on-disk-cached
(npz) frequency map per dataset dir — the only persisted artifact the reference
has; here it is rank-0-written and mmap-loadable.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

from cachedembedding_tpu._native import hostops

FREQ_CACHE_NAME = "id_freq_map.npy"


class GlobalFeatureCounter:
    def __init__(self, sparse_files: List[str], table_sizes: Sequence[int]):
        self.sparse_files = sparse_files
        self.table_sizes = np.asarray(table_sizes, np.int64)
        self.offsets = np.concatenate([[0], np.cumsum(self.table_sizes)[:-1]])
        self.total = int(self.table_sizes.sum())

    def compute(self, chunk_rows: int = 1_000_000) -> np.ndarray:
        freq = np.zeros((self.total,), np.int64)
        for path in self.sparse_files:
            arr = np.load(path, mmap_mode="r")
            for s in range(0, arr.shape[0], chunk_rows):
                # np.array (copy): asarray of an int64 mmap returns a
                # READ-ONLY view and the in-place %= below would throw
                chunk = np.array(arr[s : s + chunk_rows], dtype=np.int64)
                chunk %= self.table_sizes[None, :]
                chunk += self.offsets[None, :]
                hostops.bincount(chunk.reshape(-1), self.total, out=freq)
        return freq


class SampledParquetCounter:
    """Counterpart of PetastormCounter (10% subsample of parquet train files,
    /root/reference/recsys/datasets/criteo.py:470-473) using pyarrow directly."""

    def __init__(
        self,
        parquet_files: List[str],
        table_sizes: Sequence[int],
        subsample_fraction: float = 0.1,
        cat_prefix: str = "cat_",
    ):
        self.files = parquet_files
        self.table_sizes = np.asarray(table_sizes, np.int64)
        self.offsets = np.concatenate([[0], np.cumsum(self.table_sizes)[:-1]])
        self.total = int(self.table_sizes.sum())
        self.subsample = subsample_fraction
        self.cat_prefix = cat_prefix

    def compute(self) -> np.ndarray:
        import pyarrow.parquet as pq

        freq = np.zeros((self.total,), np.int64)
        n_files = max(1, int(len(self.files) * self.subsample))
        for path in self.files[:n_files]:
            t = pq.read_table(path)
            cat_cols = [c for c in t.column_names if c.startswith(self.cat_prefix)]
            cat_cols.sort(key=lambda c: int(c[len(self.cat_prefix):]))
            for i, col in enumerate(cat_cols):
                ids = t.column(col).to_numpy().astype(np.int64)
                ids %= self.table_sizes[i]
                ids += self.offsets[i]
                hostops.bincount(ids, self.total, out=freq)
        return freq


def get_id_freq_map(
    path: str,
    table_sizes: Sequence[int],
    *,
    is_rank_zero: bool = True,
    sparse_glob: str = "*sparse*",
) -> np.ndarray:
    """Load-or-compute the global id frequency map with an on-disk cache
    (reference saves id_freq_map.pt, criteo.py:461-465,483-485)."""
    cache_path = os.path.join(path, FREQ_CACHE_NAME)
    if os.path.exists(cache_path):
        return np.load(cache_path, mmap_mode="r")
    import glob as _glob

    sparse_files = sorted(_glob.glob(os.path.join(path, sparse_glob)))
    if not sparse_files:
        raise FileNotFoundError(f"no sparse npy shards matching {sparse_glob} in {path}")
    freq = GlobalFeatureCounter(sparse_files, table_sizes).compute()
    if is_rank_zero:
        np.save(cache_path, freq)
    return freq
