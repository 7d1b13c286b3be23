"""Streaming parquet reader — the petastorm path for Criteo-1TB-scale data
(/root/reference/recsys/datasets/criteo.py:252-378 PetastormDataReader). The
reference uses petastorm's make_batch_reader over a parquet directory; here
plain pyarrow row-group streaming does the same job (host-side I/O only — the
C++ column decoders are pyarrow's own, SURVEY.md §2.3 note that Python+pyarrow
is the appropriate level for this layer).

Parity points:
  * per-rank sharding by row-group round-robin (petastorm's cur_shard /
    shard_count semantics);
  * batches re-chunked to exactly ``batch_size`` rows across row groups,
    tail dropped (reference drops the last partial batch);
  * `% hash` remap then global-id offsetting into the fused id space
    (criteo.py:118,170-173);
  * columns: label col, ``int_X`` dense, ``cat_X`` categorical (the layout the
    reference's preprocessing emits).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from cachedembedding_tpu.jagged import Batch, RaggedFeatures


class ParquetDataReader:
    def __init__(
        self,
        parquet_dir: str,
        batch_size: int,
        table_sizes: Sequence[int],
        *,
        rank: int = 0,
        world_size: int = 1,
        dense_prefix: str = "int_",
        cat_prefix: str = "cat_",
        label_col: str = "label",
        log_transform: bool = True,
        global_ids: bool = True,
        limit_batches: Optional[int] = None,
    ):
        import pyarrow.parquet as pq  # host-side I/O

        self._pq = pq
        self.files = sorted(
            glob.glob(os.path.join(parquet_dir, "*.parquet"))
            or glob.glob(os.path.join(parquet_dir, "**", "*.parquet"), recursive=True)
        )
        if not self.files:
            raise FileNotFoundError(f"no .parquet files under {parquet_dir}")
        self.batch_size = batch_size
        self.table_sizes = np.asarray(table_sizes, np.int64)
        self.offsets = np.concatenate([[0], np.cumsum(self.table_sizes)])
        self.rank = rank
        self.world_size = world_size
        self.dense_prefix = dense_prefix
        self.cat_prefix = cat_prefix
        self.label_col = label_col
        self.log_transform = log_transform
        self.global_ids = global_ids
        self.limit_batches = limit_batches
        schema = pq.ParquetFile(self.files[0]).schema_arrow
        self.dense_cols = sorted(
            [n for n in schema.names if n.startswith(dense_prefix)],
            key=lambda n: int(n[len(dense_prefix):]),
        )
        self.cat_cols = sorted(
            [n for n in schema.names if n.startswith(cat_prefix)],
            key=lambda n: int(n[len(cat_prefix):]),
        )
        assert len(self.cat_cols) == len(table_sizes), (
            f"{len(self.cat_cols)} cat columns vs {len(table_sizes)} tables"
        )

    def _row_group_stream(self):
        """Yield pyarrow record batches, row groups sharded round-robin."""
        g = 0
        for path in self.files:
            f = self._pq.ParquetFile(path)
            for rg in range(f.num_row_groups):
                if g % self.world_size == self.rank:
                    yield f.read_row_group(
                        rg, columns=[self.label_col] + self.dense_cols + self.cat_cols
                    )
                g += 1

    def _emit(self, dense, sparse, labels) -> Batch:
        B = labels.shape[0]
        F = len(self.cat_cols)
        if self.log_transform:
            dense = np.log(np.maximum(dense, 0.0) + 2.0, dtype=np.float32)
        sparse = sparse % self.table_sizes[None, :]
        if self.global_ids:
            sparse = sparse + self.offsets[None, :-1]
        return Batch(
            dense_features=np.ascontiguousarray(dense, np.float32),
            sparse_features=RaggedFeatures(
                values=np.ascontiguousarray(sparse.T.reshape(-1), np.int32),
                offsets=None, num_features=F, batch_size=B, pooling=1,
            ),
            labels=np.ascontiguousarray(labels, np.float32),
        )

    def __iter__(self) -> Iterator[Batch]:
        B = self.batch_size
        emitted = 0
        buf_dense: List[np.ndarray] = []
        buf_sparse: List[np.ndarray] = []
        buf_labels: List[np.ndarray] = []
        buffered = 0
        for tbl in self._row_group_stream():
            dense = np.stack(
                [tbl[c].to_numpy(zero_copy_only=False) for c in self.dense_cols], axis=1
            ).astype(np.float32)
            sparse = np.stack(
                [tbl[c].to_numpy(zero_copy_only=False) for c in self.cat_cols], axis=1
            ).astype(np.int64)
            labels = tbl[self.label_col].to_numpy(zero_copy_only=False).astype(np.float32)
            buf_dense.append(dense)
            buf_sparse.append(sparse)
            buf_labels.append(labels)
            buffered += labels.shape[0]
            while buffered >= B:
                d = np.concatenate(buf_dense)
                s = np.concatenate(buf_sparse)
                l = np.concatenate(buf_labels)
                yield self._emit(d[:B], s[:B], l[:B])
                emitted += 1
                if self.limit_batches is not None and emitted >= self.limit_batches:
                    return
                buf_dense, buf_sparse, buf_labels = [d[B:]], [s[B:]], [l[B:]]
                buffered -= B
        # tail dropped (reference behavior)
