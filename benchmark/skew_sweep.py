"""Skew sensitivity of the headline bench's synthetic stream (VERDICT r2 #9).

For skew in {0.25, 0.5, 0.75} (and any extras given on argv), replays the
exact bench.py kaggle cache configuration — mixed-kernel resident split at
500k, 1% cache ratio over the cached rows, DATASET eviction, 0.7 freq
warmup — through the host directory only (no device work beyond the CPU
backend), and reports the steady-state unique-id hit rate plus the admit
(swap) volume per iteration. This turns the headline's `--skew 0.5` choice
into evidence: the hit-rate the bench reports at each skew, on the same
planning code the bench runs.

Usage: python benchmark/skew_sweep.py [skew ...]   (CPU; ~1 min per skew)
"""
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from cachedembedding_tpu.config import (  # noqa: E402
    CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE as TABLES,
)
from cachedembedding_tpu.cache.manager import CachedEmbeddingBag, CacheStats  # noqa: E402
from cachedembedding_tpu.cache.manager import EvictionStrategy  # noqa: E402
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset  # noqa: E402

THRESHOLD = 500_000
BATCH = 16384
PREFETCH = 8
WARM_ITERS = 152          # past eviction onset (~136 at kaggle scale)
MEASURE_ITERS = 80


def run(skew: float) -> None:
    resident = [t for t, n in enumerate(TABLES) if n <= THRESHOLD]
    data = SyntheticLongTailDataset(
        TABLES, BATCH, num_batches=WARM_ITERS + MEASURE_ITERS,
        dense_in_features=13, skew=skew, seed=7, learnable_labels=False,
    )
    num_cached = sum(TABLES) - sum(TABLES[t] for t in resident)
    bag = CachedEmbeddingBag(
        sum(TABLES), 8,  # dim is irrelevant to planning; keep device work tiny
        cuda_row_num=int(0.01 * num_cached),
        ids_freq_mapping=data.id_freq_map(),
        warmup_ratio=0.7,
        evict_strategy=EvictionStrategy.DATASET,
        table_sizes=list(TABLES),
        resident_tables=resident,
        weight_init="virtual",
        planner="host",
    )
    total = WARM_ITERS + MEASURE_ITERS
    it = 0
    swap_rows = 0
    for w0 in range(0, total, PREFETCH):
        ids = np.concatenate(
            [
                np.asarray(data.make_batch(i).sparse_features.values)
                for i in range(w0, min(w0 + PREFETCH, total))
            ]
        )
        if it == WARM_ITERS:
            bag.stats = CacheStats()
        pw = bag.begin_prepare(ids)
        bag.finish_prepare(pw)
        it = min(w0 + PREFETCH, total)
    s = bag.stats
    admits = sum(s.num_miss_history)
    iters = MEASURE_ITERS
    print(
        f"skew={skew:<5} hit_rate={s.hit_rate():.4f} "
        f"admits/iter={admits / iters:8.0f} "
        f"admit_wire/iter={admits / iters * 8 * 2 / 1e6:6.2f}MB(bf16 D=128: "
        f"{admits / iters * 256 / 1e6:6.2f}MB)"
    )


if __name__ == "__main__":
    extra = [float(a) for a in sys.argv[1:]]
    for skew in extra or (0.25, 0.5, 0.75):
        run(skew)
