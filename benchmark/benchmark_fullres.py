#!/usr/bin/env python
"""A/B: CachedEmbeddingBag vs fully-HBM-resident table — the TPU analog of the
reference's cache-vs-fbgemm-UVM benchmark
(/root/reference/benchmark/benchmark_fbgemm_uvm.py:93-189): the SAME synthetic
batches go through both paths; fwd+bwd time per iteration is reported for each.

The resident baseline stores the table in bf16 so Criteo-Kaggle scale (33.7M x
128) fits a 16 GB v5e chip; the cached path keeps ~1% resident in f32.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--cache-ratio", type=float, default=0.01)
    p.add_argument("--skew", type=float, default=0.5)
    p.add_argument("--scale", type=float, default=1.0,
                   help="shrink tables by this factor (e.g. 0.1 for quick runs)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from cachedembedding_tpu.baselines.full_resident import FullyResidentEmbeddingBag
    from cachedembedding_tpu.config import (
        CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
        CacheConfig,
        DLRMConfig,
    )
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = [max(8, int(t * args.scale)) for t in CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE]
    total_iters = args.iters + 5
    data = SyntheticLongTailDataset(
        tables, args.batch_size, total_iters, dense_in_features=13,
        skew=args.skew, seed=7, learnable_labels=False,
    )
    batches = [data.make_batch(i) for i in range(total_iters)]
    results = {}
    for name in ("cached", "resident"):
        cfg = DLRMConfig(
            num_embeddings_per_feature=tables,
            embedding_dim=128,
            dense_in_features=13,
            batch_size=args.batch_size,
            cache=CacheConfig(
                cache_ratio=args.cache_ratio, warmup_ratio=0.7, prefetch_num=4,
                buffer_size=0, weight_init="virtual", transfer_dtype="bfloat16",
            ),
        )
        if name == "resident":
            embed = FullyResidentEmbeddingBag(
                sum(tables), 128, table_sizes=tables, dtype=jnp.bfloat16,
                weight_init="zeros",
            )
            trainer = CachedDLRMTrainer(cfg, embed_override=embed)
        else:
            trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
        trainer.train(batches[:5], num_iters=5)  # compile + cache warm
        rep = trainer.train(batches[5:], num_iters=args.iters)
        results[name] = rep
        hbm = (
            sum(tables) * 128 * embed.element_size() / 1e9
            if name == "resident"
            else trainer.embed.capacity * 128 * 4 / 1e9
        )
        print(
            f"{name:>9}: {rep.it_per_s:6.2f} it/s  {rep.examples_per_s:9.0f} ex/s  "
            f"hit={rep.hit_rate:.3f}  embed HBM ~{hbm:.2f} GB",
            flush=True,
        )
    ratio = results["cached"].it_per_s / max(results["resident"].it_per_s, 1e-9)
    print(f"cached/resident throughput ratio: {ratio:.3f}")


if __name__ == "__main__":
    main()
