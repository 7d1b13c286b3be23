"""In-memory npy dataset pipeline — the TPU analog of the reference's
InMemoryBinaryCriteoIterDataPipe / InMemoryAvazuIterDataPipe
(/root/reference/recsys/datasets/criteo.py:38-250, recsys/datasets/avazu.py:69-180).

Behavioral parity points:
  * per-rank row-range sharding across day files (reference delegates to
    torchrec's BinaryCriteoUtils.get_file_idx_to_row_range; re-derived here);
  * `% hash` remap of raw categorical values, then **global-id offsetting**
    (`sparse += cumsum(table_sizes)` shifts) so all tables share one fused id
    space (/root/reference/recsys/datasets/criteo.py:170-173);
  * tablewise mode: only assigned tables are loaded/served
    (criteo.py:59-62,89-96);
  * train = all days but the last; val/test = first/second half of the final
    day via the rank/world doubling trick (criteo.py:380-395);
  * optional unison shuffle per batch (criteo.py:176-181).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from cachedembedding_tpu.jagged import Batch, RaggedFeatures


def rank_row_ranges(
    lengths: Sequence[int], rank: int, world_size: int
) -> Dict[int, Tuple[int, int]]:
    """Split the concatenation of files (with given row counts) into world_size
    contiguous chunks; return {file_idx: (start_row, end_row_exclusive)} for this
    rank's chunk. Remainder rows go to the first ranks (torch.tensor_split
    convention, matching the reference's sharding)."""
    total = int(sum(lengths))
    chunk = total // world_size
    rem = total % world_size
    start = rank * chunk + min(rank, rem)
    size = chunk + (1 if rank < rem else 0)
    end = start + size
    out: Dict[int, Tuple[int, int]] = {}
    file_start = 0
    for i, n in enumerate(lengths):
        file_end = file_start + n
        lo = max(start, file_start)
        hi = min(end, file_end)
        if lo < hi:
            out[i] = (lo - file_start, hi - file_start)
        file_start = file_end
    return out


def _npy_num_rows(path: str) -> int:
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, _, _ = np.lib.format._read_array_header(f, version)
    return int(shape[0])


class InMemoryNpyDataset:
    """Loads this rank's row range of (dense, sparse, labels) npy shards into
    memory and serves fixed-size Batches in the fused global id space."""

    def __init__(
        self,
        dense_paths: List[str],
        sparse_paths: List[str],
        labels_paths: List[str],
        batch_size: int,
        *,
        rank: int = 0,
        world_size: int = 1,
        shuffle_batches: bool = False,
        hashes: Optional[Sequence[int]] = None,
        assigned_tables: Optional[Sequence[int]] = None,
        seed: int = 0,
    ):
        assert len(dense_paths) == len(sparse_paths) == len(labels_paths)
        self.batch_size = batch_size
        self.shuffle_batches = shuffle_batches
        self._rng = np.random.default_rng(seed + rank)

        lengths = [_npy_num_rows(p) for p in dense_paths]
        ranges = rank_row_ranges(lengths, rank, world_size)

        dense_l, sparse_l, labels_l = [], [], []
        for i, (lo, hi) in ranges.items():
            dense_l.append(np.load(dense_paths[i], mmap_mode="r")[lo:hi].astype(np.float32))
            sparse_l.append(np.load(sparse_paths[i], mmap_mode="r")[lo:hi].astype(np.int64))
            labels_l.append(np.load(labels_paths[i], mmap_mode="r")[lo:hi].astype(np.int32))
        self.dense = np.concatenate(dense_l) if dense_l else np.zeros((0, 1), np.float32)
        sparse = np.concatenate(sparse_l) if sparse_l else np.zeros((0, 0), np.int64)
        self.labels = (
            np.concatenate(labels_l).reshape(-1) if labels_l else np.zeros((0,), np.int32)
        )

        num_tables = sparse.shape[1] if sparse.size else (len(hashes) if hashes else 0)
        if assigned_tables is None:
            assigned_tables = list(range(num_tables))
        self.assigned_tables = np.asarray(assigned_tables)
        sparse = sparse[:, self.assigned_tables] if sparse.size else sparse

        if hashes is not None and sparse.size:
            h = np.asarray(hashes, np.int64)
            offsets = np.concatenate([[0], np.cumsum(h)[:-1]])
            sparse %= h[self.assigned_tables][None, :]
            sparse += offsets[self.assigned_tables][None, :]
        elif not sparse.size:
            sparse = sparse.reshape(0, len(self.assigned_tables))
        self.sparse = sparse.astype(np.int64)

        self.num_batches = self.dense.shape[0] // batch_size

    @property
    def num_features(self) -> int:
        return int(self.assigned_tables.shape[0])

    def make_batch(self, idx: int) -> Batch:
        s = idx * self.batch_size
        e = s + self.batch_size
        dense = self.dense[s:e]
        sparse = self.sparse[s:e]
        labels = self.labels[s:e]
        if self.shuffle_batches:
            perm = self._rng.permutation(self.batch_size)
            dense, sparse, labels = dense[perm], sparse[perm], labels[perm]
        feats = RaggedFeatures(
            values=sparse.T.reshape(-1).astype(np.int32),  # feature-major
            offsets=None,
            num_features=self.num_features,
            batch_size=self.batch_size,
            pooling=1,
        )
        return Batch(dense_features=dense, sparse_features=feats, labels=labels)

    def __iter__(self) -> Iterator[Batch]:
        for i in range(self.num_batches):
            yield self.make_batch(i)

    def __len__(self) -> int:
        return self.num_batches


def stage_files(
    dataset_dir: str, stage: str, final_day: int
) -> Tuple[List[str], List[str], List[str], int, int]:
    """Reference split semantics (/root/reference/recsys/datasets/criteo.py:380-395):
    train = all days but day ``final_day``; val = first half of the final day,
    test = second half (via rank/world doubling applied by the caller).
    Returns (dense, sparse, labels paths, extra_rank_offset, world_multiplier)."""
    files = os.listdir(dataset_dir)

    def is_final(s: str) -> bool:
        return f"day_{final_day}" in s

    if stage == "train":
        files = [f for f in files if not is_final(f)]
        extra_rank, world_mult = 0, 1
    else:
        files = [f for f in files if is_final(f)]
        extra_rank = 0 if stage == "val" else 1
        world_mult = 2
    out = []
    for kind in ["dense", "sparse", "labels"]:
        out.append(
            sorted(os.path.join(dataset_dir, f) for f in files if kind in f)
        )
    return out[0], out[1], out[2], extra_rank, world_mult
