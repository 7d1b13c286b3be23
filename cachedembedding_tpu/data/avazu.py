"""Avazu CTR dataset entry points (/root/reference/recsys/datasets/avazu.py:229-290).

Avazu has 13 categorical and 8 integer features (avazu.py:34); the preprocessing
CLI (scripts/preprocess/npy_preproc_avazu.py) writes the same dense/sparse/labels
npy shard layout Criteo uses, so the loader is shared. Avazu splits 90/10
train/eval on row count rather than by day."""

from __future__ import annotations

from typing import List, Optional, Sequence

import os

import numpy as np

from cachedembedding_tpu.config import AVAZU_NUM_EMBEDDINGS_PER_FEATURE
from cachedembedding_tpu.data.feature_counter import get_id_freq_map as _freq
from cachedembedding_tpu.data.npy_dataset import InMemoryNpyDataset

STAGES = ["train", "val", "test"]


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
    files = sorted(os.listdir(dataset_dir))

    def pick(kind: str, names) -> List[str]:
        return sorted(os.path.join(dataset_dir, f) for f in names if kind in f)

    train_files = [f for f in files if "train" in f] or files
    eval_files = [f for f in files if "val" in f or "test" in f]
    if stage == "train":
        names, eff_rank, eff_world = train_files, rank, world_size
    else:
        if eval_files:
            names = eval_files
            eff_rank = rank + (0 if stage == "val" else world_size)
            eff_world = world_size * 2
        else:  # single-shard layout: split the tail of train
            names = train_files
            eff_rank = rank + (0 if stage == "val" else world_size)
            eff_world = world_size * 2
    return InMemoryNpyDataset(
        pick("dense", names),
        pick("sparse", names),
        pick("labels", names),
        batch_size,
        rank=eff_rank,
        world_size=eff_world,
        shuffle_batches=shuffle_batches and stage == "train",
        hashes=hashes if hashes is not None else AVAZU_NUM_EMBEDDINGS_PER_FEATURE,
        assigned_tables=assigned_tables,
        seed=seed,
    )


def get_id_freq_map(
    dataset_dir: str, is_rank_zero: bool = True, table_sizes=None
) -> np.ndarray:
    return _freq(
        dataset_dir,
        list(table_sizes) if table_sizes is not None else AVAZU_NUM_EMBEDDINGS_PER_FEATURE,
        is_rank_zero=is_rank_zero,
    )
