"""Dict-batch -> Batch transform — the KJTTransform analog
(/root/reference/recsys/datasets/utils.py:57-99), which adapts NVTabular-style
dict batches {feature_name: column} into the trainer's Batch/KJT layout with
the per-feature offset shift into the fused global id space."""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from cachedembedding_tpu.jagged import Batch, RaggedFeatures


class DictBatchTransform:
    def __init__(
        self,
        dense_cols: Sequence[str],
        sparse_cols: Sequence[str],
        table_sizes: Sequence[int],
        label_col: str = "label",
        *,
        hash_ids: bool = True,
        global_ids: bool = True,
    ):
        assert len(sparse_cols) == len(table_sizes)
        self.dense_cols = list(dense_cols)
        self.sparse_cols = list(sparse_cols)
        self.table_sizes = np.asarray(table_sizes, np.int64)
        self.offsets = np.concatenate([[0], np.cumsum(self.table_sizes)])
        self.label_col = label_col
        self.hash_ids = hash_ids
        self.global_ids = global_ids

    def __call__(self, columns: Mapping[str, np.ndarray]) -> Batch:
        dense = np.stack(
            [np.asarray(columns[c], np.float32).reshape(-1) for c in self.dense_cols],
            axis=1,
        )
        B = dense.shape[0]
        F = len(self.sparse_cols)
        sparse = np.stack(
            [np.asarray(columns[c], np.int64).reshape(-1) for c in self.sparse_cols],
            axis=1,
        )
        if self.hash_ids:
            sparse = sparse % self.table_sizes[None, :]
        if self.global_ids:
            sparse = sparse + self.offsets[None, :-1]
        labels = np.asarray(columns[self.label_col], np.float32).reshape(-1)
        return Batch(
            dense_features=dense,
            sparse_features=RaggedFeatures(
                values=sparse.T.reshape(-1).astype(np.int32), offsets=None,
                num_features=F, batch_size=B, pooling=1,
            ),
            labels=labels,
        )
