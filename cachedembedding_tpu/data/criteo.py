"""Criteo (Kaggle + 1TB) dataset entry points — get_dataloader/get_id_freq_map
parity (/root/reference/recsys/datasets/criteo.py:380-486)."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from cachedembedding_tpu.config import (
    CRITEO_1TB_NUM_EMBEDDINGS_PER_FEATURE,
    CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
)
from cachedembedding_tpu.data.feature_counter import get_id_freq_map as _freq
from cachedembedding_tpu.data.npy_dataset import InMemoryNpyDataset, stage_files

STAGES = ["train", "val", "test"]
DAYS = 24  # criteo 1TB
KAGGLE_DAYS = 7


def table_sizes_for(dataset_dir: str) -> List[int]:
    return (
        CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
        if "kaggle" in dataset_dir
        else CRITEO_1TB_NUM_EMBEDDINGS_PER_FEATURE
    )


def get_dataloader(
    dataset_dir: str,
    stage: str,
    batch_size: int,
    rank: int = 0,
    world_size: int = 1,
    *,
    shuffle_batches: bool = False,
    hashes: Optional[Sequence[int]] = None,
    assigned_tables: Optional[Sequence[int]] = None,
    seed: int = 0,
) -> InMemoryNpyDataset:
    stage = stage.lower()
    if stage not in STAGES:
        raise ValueError(f"stage {stage} not in {STAGES}")
    final_day = (KAGGLE_DAYS if "kaggle" in dataset_dir else DAYS) - 1
    dense, sparse, labels, extra_rank, world_mult = stage_files(
        dataset_dir, stage, final_day
    )
    # val/test: halves of the final day via rank offset + doubled world
    # (/root/reference/recsys/datasets/criteo.py:386-391)
    eff_rank = rank + extra_rank * world_size
    eff_world = world_size * world_mult
    return InMemoryNpyDataset(
        dense,
        sparse,
        labels,
        batch_size,
        rank=eff_rank,
        world_size=eff_world,
        shuffle_batches=shuffle_batches and stage == "train",
        hashes=hashes if hashes is not None else table_sizes_for(dataset_dir),
        assigned_tables=assigned_tables,
        seed=seed,
    )


def get_id_freq_map(
    dataset_dir: str,
    is_rank_zero: bool = True,
    table_sizes: Optional[Sequence[int]] = None,
) -> np.ndarray:
    return _freq(
        dataset_dir,
        list(table_sizes) if table_sizes is not None else table_sizes_for(dataset_dir),
        is_rank_zero=is_rank_zero,
    )
