#!/usr/bin/env python
"""Bare CachedEmbeddingBag microbenchmark — parity with
/root/reference/benchmark/benchmark_cache.py:1-108: measures hit rate, swap
bandwidth and iteration time of the cache alone (forward + backward + SGD on the
cached rows, no dense model), sweeping batch size / cache ratio / warmup /
buffer / eviction strategy.

Runs on synthetic long-tail ids at Criteo-Kaggle scale (the reference uses real
Kaggle ids; pass --dataset_dir to do the same here).

Usage: python benchmark/benchmark_cache.py [--quick]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench_one(
    tables,
    batch_size,
    embedding_dim,
    cache_ratio,
    *,
    use_lfu,
    warmup_ratio,
    buffer_size,
    skew,
    iters=50,
    id_freq_map=None,
    ids_source=None,
):
    import jax
    import jax.numpy as jnp

    from cachedembedding_tpu.cache.manager import CachedEmbeddingBag
    from cachedembedding_tpu.cache.state import EvictionStrategy
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.jagged import RaggedFeatures

    N = sum(tables)
    data = SyntheticLongTailDataset(
        tables, batch_size, iters + 5, skew=skew, seed=3, learnable_labels=False
    )
    if id_freq_map is None and (warmup_ratio > 0 or not use_lfu):
        id_freq_map = data.id_freq_map()
    bag = CachedEmbeddingBag(
        N,
        embedding_dim,
        cache_ratio=cache_ratio,
        ids_freq_mapping=id_freq_map,
        warmup_ratio=warmup_ratio,
        buffer_size=buffer_size,
        evict_strategy=EvictionStrategy.LFU if use_lfu else EvictionStrategy.DATASET,
        table_sizes=tables,
        weight_init="virtual",
        transfer_dtype="bfloat16",
    )
    F = len(tables)
    grad = jnp.ones((batch_size, F, embedding_dim), jnp.float32)

    @jax.jit
    def fwd_bwd(cw, values):
        feats = RaggedFeatures(
            values=values, offsets=None, num_features=F, batch_size=batch_size, pooling=1
        )
        def f(w):
            from cachedembedding_tpu.ops.embedding_bag import embedding_bag
            return jnp.vdot(embedding_bag(w, feats), grad)
        g = jax.grad(f)(cw)
        return cw - 0.01 * g

    # warmup compiles
    for i in range(3):
        b = data.make_batch(i)
        slots = bag.prepare_ids(np.asarray(b.sparse_features.values))
        bag.set_param(fwd_bwd(bag.cache_weight, slots))
    jax.block_until_ready(bag.cache_weight)
    bag.stats.num_hits_history.clear()
    bag.stats.num_miss_history.clear()

    t0 = time.perf_counter()
    for i in range(3, 3 + iters):
        b = data.make_batch(i)
        slots = bag.prepare_ids(np.asarray(b.sparse_features.values))
        bag.set_param(fwd_bwd(bag.cache_weight, slots))
    jax.block_until_ready(bag.cache_weight)
    dt = (time.perf_counter() - t0) / iters
    return {
        "it_ms": dt * 1e3,
        "hit_rate": bag.stats.hit_rate(),
        "stats": bag.stats.summary(),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--embedding_dim", type=int, default=128)
    p.add_argument("--skew", type=float, default=0.5)
    args = p.parse_args()

    from cachedembedding_tpu.config import CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE

    tables = CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
    if args.quick:
        sweeps = [dict(batch_size=16384, cache_ratio=0.01, use_lfu=False,
                       warmup_ratio=0.7, buffer_size=0)]
    else:
        sweeps = [
            dict(batch_size=bs, cache_ratio=0.01, use_lfu=False, warmup_ratio=0.7, buffer_size=0)
            for bs in (4096, 16384)
        ] + [
            dict(batch_size=16384, cache_ratio=cr, use_lfu=False, warmup_ratio=0.7, buffer_size=0)
            for cr in (0.005, 0.02)
        ] + [
            dict(batch_size=16384, cache_ratio=0.01, use_lfu=True, warmup_ratio=0.7, buffer_size=0),
            dict(batch_size=16384, cache_ratio=0.01, use_lfu=False, warmup_ratio=0.0, buffer_size=0),
            dict(batch_size=16384, cache_ratio=0.01, use_lfu=False, warmup_ratio=0.7, buffer_size=50_000),
        ]
    print(f"{'batch':>6} {'ratio':>6} {'lfu':>4} {'warm':>5} {'buf':>6} | {'ms/it':>8} {'hit':>6}")
    for sw in sweeps:
        r = bench_one(tables, embedding_dim=args.embedding_dim, skew=args.skew,
                      iters=10 if args.quick else 30, **sw)
        print(
            f"{sw['batch_size']:>6} {sw['cache_ratio']:>6} {int(sw['use_lfu']):>4} "
            f"{sw['warmup_ratio']:>5} {sw['buffer_size']:>6} | "
            f"{r['it_ms']:>8.1f} {r['hit_rate']:>6.3f}"
        )
        log(r["stats"])


if __name__ == "__main__":
    main()
