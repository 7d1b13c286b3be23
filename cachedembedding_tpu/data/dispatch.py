"""Unified dataloader dispatch — analog of the reference baseline's
get_dataloader source switch (/root/reference/baselines/data/dlrm_dataloader.py:283):
random | criteo (in-memory npy) | criteo_parquet (petastorm analog) | avazu |
synth (fbgemm traces) | custom (procedural long-tail)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def get_dataloader(
    source: str,
    stage: str,
    batch_size: int,
    *,
    dataset_dir: Optional[str] = None,
    table_sizes: Optional[Sequence[int]] = None,
    num_batches: int = 10,
    dense_in_features: int = 13,
    rank: int = 0,
    world_size: int = 1,
    seed: int = 0,
    prefetch_depth: int = 0,
    **kw,
):
    stage_seed = seed + {"train": 0, "val": 1, "test": 2}.get(stage, 0)
    if source == "random":
        from cachedembedding_tpu.data.random_rec import RandomRecDataset

        data = RandomRecDataset(
            table_sizes, batch_size, num_batches,
            dense_in_features=dense_in_features, seed=stage_seed, **kw,
        )
    elif source == "custom":
        from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset

        data = SyntheticLongTailDataset(
            table_sizes, batch_size, num_batches,
            dense_in_features=dense_in_features, seed=stage_seed, **kw,
        )
    elif source == "synth":
        from cachedembedding_tpu.data.synth import SynthTraceDataset

        data = SynthTraceDataset.from_dir(
            dataset_dir, batch_size, num_batches, seed=stage_seed, **kw,
        )
    elif source == "criteo":
        from cachedembedding_tpu.data import criteo

        data = criteo.get_dataloader(
            dataset_dir, stage, batch_size, rank=rank, world_size=world_size,
            seed=seed, **kw,
        )
    elif source == "criteo_parquet":
        from cachedembedding_tpu.data.parquet import ParquetDataReader

        data = ParquetDataReader(
            dataset_dir, batch_size, table_sizes, rank=rank,
            world_size=world_size, **kw,
        )
    elif source == "avazu":
        from cachedembedding_tpu.data import avazu

        data = avazu.get_dataloader(
            dataset_dir, stage, batch_size, rank=rank, world_size=world_size,
            seed=seed, **kw,
        )
    else:
        raise ValueError(f"unknown data source {source!r}")
    if prefetch_depth > 0:
        from cachedembedding_tpu.data.prefetch import PrefetchIterator

        return PrefetchIterator(data, depth=prefetch_depth)
    return data
