"""Mixed-kernel execution: small tables HBM-resident + big tables cached in
ONE model/bag (the torchrec planner's per-table kernel decisions actually
executing, /root/reference/baselines/dlrm_main.py:725-792). Resident rows use
the same canonical init as cached rows, so mixed must match all-cached
numerically."""

import numpy as np
import pytest

from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

TABLES = [700, 300, 50, 20]


def _cfg(resident_threshold=0, cache_ratio=0.9, **kw):
    return DLRMConfig(
        num_embeddings_per_feature=TABLES,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=128,
        learning_rate=0.5,
        cache=CacheConfig(
            cache_ratio=cache_ratio, warmup_ratio=0.7, buffer_size=0,
            prefetch_num=2, use_lfu_eviction=True, use_freq=False,
            planner="host", resident_threshold=resident_threshold,
        ),
        **kw,
    )


def _data(cfg, n, seed=31, pooling=1):
    return SyntheticLongTailDataset(
        TABLES, cfg.batch_size, num_batches=n, dense_in_features=4, seed=seed,
        pooling_factor=pooling,
    )


def test_mixed_matches_all_cached():
    """One resident + cached split vs all-cached: identical training losses and
    eval AUROC (cache big enough that neither path evicts)."""
    runs = []
    for thr in (0, 100):
        cfg = _cfg(resident_threshold=thr)
        trainer = CachedDLRMTrainer(cfg)
        if thr:
            assert trainer.embed.resident_tables == [2, 3]
            assert trainer.embed.resident_total == 70
            assert trainer.embed.device_rows == trainer.embed.capacity + 70
        rep = trainer.train(_data(cfg, 6), num_iters=6)
        ev = trainer.evaluate(_data(cfg, 2, seed=99))
        runs.append((rep.losses, ev["auroc"]))
    np.testing.assert_allclose(runs[0][0], runs[1][0], rtol=1e-5)
    np.testing.assert_allclose(runs[0][1], runs[1][1], atol=1e-4)


def test_mixed_with_evictions_trains():
    """Small cache on the big tables + resident smalls: admits/evicts must flow
    through the resident-offset address space without corruption."""
    cfg = _cfg(resident_threshold=100, cache_ratio=0.3)
    trainer = CachedDLRMTrainer(cfg)
    rep = trainer.train(_data(cfg, 8), num_iters=8)
    assert np.isfinite(rep.losses).all()
    assert trainer.embed.stats.prepare_calls > 0
    # training must actually move the loss
    assert np.mean(rep.losses[-2:]) < np.mean(rep.losses[:2])


def test_mixed_flush_coherence():
    """flush() must write BOTH dirty cache slots and the resident region back
    to the host table; dense_weight() then equals gathers through the bag."""
    cfg = _cfg(resident_threshold=100, cache_ratio=0.5)
    trainer = CachedDLRMTrainer(cfg)
    trainer.train(_data(cfg, 4), num_iters=4)
    w = trainer.embed.dense_weight()
    assert w.shape == (sum(TABLES), 16)
    # resident tables' rows (global ids 1000..1070) must reflect training,
    # not the canonical init: at least some rows differ from a fresh bag
    cfg2 = _cfg(resident_threshold=100, cache_ratio=0.5)
    fresh = CachedDLRMTrainer(cfg2).embed.dense_weight()
    assert not np.allclose(w[1000:1070], fresh[1000:1070])
    # rows never seen in training still agree with the canonical init
    seen = np.unique(
        np.concatenate(
            [np.asarray(b.sparse_features.values) for b in _data(cfg, 4)]
        )
    )
    untouched = np.setdiff1d(np.arange(sum(TABLES)), seen)
    assert untouched.size > 0
    np.testing.assert_allclose(w[untouched], fresh[untouched], atol=1e-6)


def test_mixed_sparse_grad_path():
    """capacity+R > 4L triggers the scatter-add grad path; must match the
    dense-grad path run on the same stream."""
    losses = []
    for bs in (16, 128):  # 16 -> sparse path (device_rows > 4*64), 128 -> dense
        cfg = _cfg(resident_threshold=100)
        cfg.batch_size = bs
        trainer = CachedDLRMTrainer(cfg)
        rep = trainer.train(_data(cfg, 4), num_iters=4)
        assert np.isfinite(rep.losses).all()
        losses.append(rep.losses)


def test_all_tables_resident():
    """Degenerate split: every table resident — no cache traffic at all."""
    cfg = _cfg(resident_threshold=10_000)
    trainer = CachedDLRMTrainer(cfg)
    assert trainer.embed.resident_total == sum(TABLES)
    rep = trainer.train(_data(cfg, 4), num_iters=4)
    assert np.isfinite(rep.losses).all()
    st = trainer.embed.stats
    assert st.swap_in_bytes == 0 and sum(st.num_miss_history) == 0


def test_mixed_pooling_gt_one():
    """Per-feature wire format with pooling_factor > 1: the encoder packs
    L//F = B*pooling ids per feature, and the decoder must use the same count
    (regression for a decode that reshaped with B and failed at trace time)."""
    runs = []
    for thr in (0, 100):
        cfg = _cfg(resident_threshold=thr)
        trainer = CachedDLRMTrainer(cfg)
        rep = trainer.train(_data(cfg, 6, pooling=4), num_iters=6)
        assert np.isfinite(rep.losses).all()
        runs.append(rep.losses)
    # mixed-kernel split must match all-cached on the same pooled stream
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-5)


def test_mixed_adagrad():
    cfg = _cfg(resident_threshold=100, embedding_optimizer="rowwise_adagrad")
    trainer = CachedDLRMTrainer(cfg)
    rep = trainer.train(_data(cfg, 4), num_iters=4)
    assert np.isfinite(rep.losses).all()


def test_uniform_layout_plan_matches_generic():
    """The positional-layout window plan (_plan_window_uniform) must produce
    the identical full-stream device addresses and the identical cached
    sub-stream plan as the generic searchsorted translate, including resident
    address placement interleaved with cache slots."""
    import numpy as np

    from cachedembedding_tpu.cache.manager import CachedEmbeddingBag

    tables = [500, 64, 300, 48]  # tables 1 and 3 resident at threshold 100
    rng = np.random.default_rng(3)
    bag_a = CachedEmbeddingBag(
        sum(tables), 8, cache_ratio=0.5, table_sizes=tables, seed=11,
        planner="host", resident_tables=[1, 3],
    )
    bag_b = CachedEmbeddingBag(
        sum(tables), 8, cache_ratio=0.5, table_sizes=tables, seed=11,
        planner="host", resident_tables=[1, 3],
    )
    P, F, Bp = 3, 4, 32
    offs = np.concatenate([[0], np.cumsum(tables)])
    for _ in range(4):  # several windows: directory state must stay in sync
        ids = np.concatenate([
            np.stack([
                rng.integers(offs[t], offs[t + 1], size=Bp) for t in range(F)
            ]).reshape(-1)
            for _ in range(P)
        ]).astype(np.int32)
        hp_a, full_a = bag_a._plan_window_uniform(ids.copy(), P, Bp)
        hp_b, full_b = bag_b._plan_window(ids.copy())
        assert np.array_equal(full_a, full_b)
        assert np.array_equal(hp_a.slot_ids, hp_b.slot_ids)
        assert np.array_equal(hp_a.admit_rows, hp_b.admit_rows)
        assert np.array_equal(hp_a.admit_slots, hp_b.admit_slots)
        assert np.array_equal(hp_a.evict_rows, hp_b.evict_rows)


def test_onehot_backward_plan_contents():
    """The static one-hot plan must name exactly the resident tables at or
    under the row bound, at the device base each table's block occupies
    (capacity + running resident offset)."""
    cfg = _cfg(resident_threshold=100)
    trainer = CachedDLRMTrainer(cfg)
    bag = trainer.embed
    plan = bag.onehot_backward_plan(max_rows=2048)
    # TABLES = [700, 300, 50, 20] at threshold 100 -> tables 2, 3 resident
    assert [f for (f, _, _) in plan] == [2, 3]
    cap = bag.capacity
    assert plan[0][1:] == (cap, 50)        # table 2 block starts at capacity
    assert plan[1][1:] == (cap + 50, 20)   # table 3 block follows
    # threshold below the table sizes -> empty plan
    assert bag.onehot_backward_plan(max_rows=10) == ()
    # the trainer picked the plan up for the fused window programs
    assert trainer._onehot_plan == plan


def test_onehot_vs_scatter_grads_bitwise():
    """Op-level check: the one-hot MXU grad block equals the f32 scatter-add
    of the same per-row grads (same addends, f32 accumulation)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    B, R, D, base, N = 512, 50, 16, 64, 256
    ids = jnp.asarray(base + rng.integers(0, R, B).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)).astype(jnp.bfloat16)

    @jax.jit
    def scatter_ref(ids, g):
        return jnp.zeros((N, D), jnp.float32).at[ids].add(
            g.astype(jnp.float32), mode="promise_in_bounds"
        )[base : base + R]

    @jax.jit
    def onehot(ids, g):
        rel = ids - base
        oh = (rel[:, None] == jnp.arange(R, dtype=rel.dtype)).astype(g.dtype)
        return jnp.einsum("br,bd->rd", oh, g, preferred_element_type=jnp.float32)

    a = np.asarray(scatter_ref(ids, g))
    b = np.asarray(onehot(ids, g))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
