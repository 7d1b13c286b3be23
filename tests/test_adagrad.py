"""Row-wise Adagrad with cache-tiered optimizer state (beyond-reference:
the reference trains SGD only). Contract: training through the cache at ANY
cache ratio is numerically identical to fully-resident rowwise adagrad, and
the accumulator survives evict -> writeback -> re-admit round trips."""

import numpy as np
import jax.numpy as jnp
import pytest

from cachedembedding_tpu.baselines.full_resident import FullyResidentEmbeddingBag
from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer


def _cfg(tables, cache_ratio, **kw):
    return DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=128,
        learning_rate=0.5,
        embedding_optimizer="rowwise_adagrad",
        cache=CacheConfig(cache_ratio=cache_ratio, warmup_ratio=0.0,
                          buffer_size=0, prefetch_num=2, use_freq=False,
                          use_lfu_eviction=True, **kw),
    )


def _data(tables, n, seed=31):
    return SyntheticLongTailDataset(
        tables, 128, num_batches=n, dense_in_features=4, seed=seed
    )


def test_adagrad_trains_and_differs_from_sgd():
    tables = [800, 400]
    cfg = _cfg(tables, cache_ratio=0.9)
    trainer = CachedDLRMTrainer(cfg)
    rep = trainer.train(_data(tables, 8), num_iters=8)
    assert np.isfinite(rep.losses).all()
    assert rep.losses[-1] < rep.losses[0]
    # accumulator actually accumulated
    acc = np.asarray(trainer.embed.cache_accum)
    assert (acc > 0).any()

    cfg_sgd = _cfg(tables, cache_ratio=0.9)
    cfg_sgd.embedding_optimizer = "sgd"
    rep_sgd = CachedDLRMTrainer(cfg_sgd).train(_data(tables, 8), num_iters=8)
    assert not np.allclose(rep.losses[1:], rep_sgd.losses[1:])


def test_cached_adagrad_matches_full_resident():
    """At cache_ratio=1 (no evictions) AND at a small ratio (heavy evictions),
    cached rowwise adagrad must equal the fully-resident implementation —
    the accumulator tiering is semantically invisible."""
    tables = [600, 300]
    for ratio in (1.0, 0.2):
        cfg = _cfg(tables, cache_ratio=ratio)
        cached = CachedDLRMTrainer(cfg)
        rep_c = cached.train(_data(tables, 10), num_iters=10)

        fr = FullyResidentEmbeddingBag(
            sum(tables), cfg.embedding_dim, table_sizes=tables, seed=cfg.seed,
            dtype=cached.embed.dtype, optimizer="rowwise_adagrad",
        )
        base = CachedDLRMTrainer(cfg, embed_override=fr)
        rep_f = base.train(_data(tables, 10), num_iters=10)
        np.testing.assert_allclose(
            rep_c.losses, rep_f.losses, rtol=3e-5,
            err_msg=f"cache_ratio={ratio}",
        )


def test_accum_survives_eviction_roundtrip():
    tables = [600, 300]
    cfg = _cfg(tables, cache_ratio=0.3)  # heavy eviction pressure
    trainer = CachedDLRMTrainer(cfg)
    trainer.train(_data(tables, 12), num_iters=12)
    trainer.embed.flush()
    # host store now holds accumulators for trained rows
    host_acc = trainer.embed.host_accum
    rows = np.arange(sum(tables), dtype=np.int64)
    acc = host_acc.gather(rows)
    assert (acc > 0).sum() > 50  # many rows trained across evictions


def test_accum_survives_eviction_nonstaged_path():
    """The NON-staged host-planner path (bare prepare_ids/finish_prepare, no
    trainer window staging) must write the adagrad accumulator back on
    eviction too — a regression test for the path that silently dropped it
    (evicted rows re-admitted with accumulator reset to initial)."""
    import jax.numpy as jnp

    from cachedembedding_tpu.cache.manager import CachedEmbeddingBag

    N, D, C = 300, 8, 40
    bag = CachedEmbeddingBag(
        N, D, cuda_row_num=C, buffer_size=0, planner="host",
        optimizer="rowwise_adagrad",
    )
    # round 1: make rows 0..C-1 resident and give them accumulator state
    ids1 = np.arange(C, dtype=np.int64)
    slots1 = np.asarray(bag.prepare_ids(ids1))
    bag.set_accum(bag.cache_accum.at[slots1].set(7.5))
    # round 2: a disjoint working set evicts all of round 1's rows
    ids2 = np.arange(C, 2 * C, dtype=np.int64)
    bag.prepare_ids(ids2)
    # round 3: re-admit round 1's rows — their accumulator must come back
    slots3 = np.asarray(bag.prepare_ids(ids1))
    acc = np.asarray(bag.cache_accum)[slots3]
    np.testing.assert_allclose(acc, 7.5, rtol=1e-6)


def test_adagrad_checkpoint_roundtrip(tmp_path):
    from cachedembedding_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    tables = [400, 200]
    cfg = _cfg(tables, cache_ratio=0.3)
    # warmup>0 exercises the warm-row accumulator restore path
    cfg.cache.warmup_ratio = 0.5
    cfg.cache.use_freq = True
    freq = _data(tables, 6).id_freq_map()
    t1 = CachedDLRMTrainer(cfg, id_freq_map=freq)
    t1.train(_data(tables, 6), num_iters=6)
    save_checkpoint(str(tmp_path / "ck"), t1)

    t2 = CachedDLRMTrainer(cfg, id_freq_map=freq)
    load_checkpoint(str(tmp_path / "ck"), t2)
    # continue training both: identical losses (state fully restored)
    r1 = t1.train(_data(tables, 4, seed=77), num_iters=4)
    r2 = t2.train(_data(tables, 4, seed=77), num_iters=4)
    np.testing.assert_allclose(r1.losses, r2.losses, rtol=3e-5)


def test_long_equivalence_under_heavy_eviction():
    """40 iterations at a small cache ratio with LFU churn: the cached path
    (staged windows, lazy device init, deferred writebacks, adagrad tiering)
    must track the fully-resident reference exactly the whole way."""
    tables = [900, 450]
    cfg = _cfg(tables, cache_ratio=0.35)
    cfg.cache.prefetch_num = 3
    cached = CachedDLRMTrainer(cfg)
    rep_c = cached.train(_data(tables, 40, seed=5), num_iters=40)

    fr = FullyResidentEmbeddingBag(
        sum(tables), cfg.embedding_dim, table_sizes=tables, seed=cfg.seed,
        dtype=cached.embed.dtype, optimizer="rowwise_adagrad",
    )
    base = CachedDLRMTrainer(cfg, embed_override=fr)
    rep_f = base.train(_data(tables, 40, seed=5), num_iters=40)
    np.testing.assert_allclose(rep_c.losses, rep_f.losses, rtol=5e-5)
    # and the flushed host table matches the resident table
    cached.embed.flush()
    host = cached.embed.host_table.gather(np.arange(sum(tables), dtype=np.int64))
    resident = np.asarray(fr.cache_weight.astype(jnp.float32))
    # rows never touched by training keep their init on both sides; trained
    # rows went through bf16 cache storage on BOTH paths -> close match
    np.testing.assert_allclose(host, resident, rtol=1e-2, atol=1e-3)
