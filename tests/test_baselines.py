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


def test_full_stack_without_native_lib(monkeypatch):
    """Everything must run (slower) when libhostops.so is absent: numpy
    fallbacks for gather/scatter/pack/canonical-init and the PyDirectory
    planner."""
    from cachedembedding_tpu._native import hostops

    monkeypatch.setattr(hostops, "native_available", lambda: False)
    monkeypatch.setattr(hostops, "_load_lib", lambda: None)

    tables = [300, 200]
    cfg = DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(16, 1),
        batch_size=64,
        learning_rate=0.3,
        embedding_optimizer="rowwise_adagrad",
        cache=CacheConfig(cache_ratio=0.5, warmup_ratio=0.5, buffer_size=0,
                          prefetch_num=2, use_freq=True, use_lfu_eviction=False),
    )
    data = SyntheticLongTailDataset(tables, cfg.batch_size, 8, dense_in_features=4, seed=9)
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    assert type(trainer.embed._dir).__name__ == "PyDirectory"
    rep = trainer.train(data, num_iters=8)
    assert np.isfinite(rep.losses).all()
    trainer.embed.flush()
