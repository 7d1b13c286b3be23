"""Baseline (no-cache) paths: fully-HBM-resident embedding through the same
pipelined trainer — the A/B partner for the cache (reference:
/root/reference/baselines/dlrm_main.py, kernel 'fused')."""

import numpy as np

from cachedembedding_tpu.baselines.full_resident import FullyResidentEmbeddingBag
from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer


def test_full_resident_matches_cached_training():
    """Same data, same seeds: the fully-resident baseline and the cached path
    must produce identical losses (the cache is transparent)."""
    tables = [600, 400]
    cfg = DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=128,
        learning_rate=0.5,
        cache=CacheConfig(cache_ratio=1.0, warmup_ratio=0.0, buffer_size=0,
                          prefetch_num=2, use_freq=False, use_lfu_eviction=True),
    )
    data = lambda: SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=6, dense_in_features=4, seed=21
    )
    cached = CachedDLRMTrainer(cfg, id_freq_map=None)
    r_cached = cached.train(data(), num_iters=6)

    fr = FullyResidentEmbeddingBag(
        sum(tables), cfg.embedding_dim, table_sizes=tables, seed=cfg.seed,
        dtype=cached.embed.dtype,
    )
    baseline = CachedDLRMTrainer(cfg, embed_override=fr)
    r_base = baseline.train(data(), num_iters=6)

    assert np.isfinite(r_base.losses).all()
    np.testing.assert_allclose(r_base.losses, r_cached.losses, rtol=2e-5)
