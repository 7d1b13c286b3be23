"""End-to-end: tiny cached DLRM learns on synthetic long-tail data (the reference's
metric-based validation strategy, SURVEY.md §4)."""

import numpy as np

from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer


def _cfg(tables, **cache_kw):
    return DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=256,
        learning_rate=0.5,
        cache=CacheConfig(
            # tiny capacities: pin the reference's unpipelined window depth
            # unless a test overrides (package default is 8)
            cache_ratio=0.3, warmup_ratio=0.7, buffer_size=0,
            **{"prefetch_num": 1, **cache_kw},
        ),
    )


def test_training_lifts_auroc():
    tables = [1000, 2000, 500, 300]
    cfg = _cfg(tables, prefetch_num=2)
    cfg.learning_rate = 0.3
    data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=30, dense_in_features=4, seed=3
    )
    eval_data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=5, dense_in_features=4, seed=99
    )
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    untrained = trainer.evaluate(eval_data)["auroc"]
    report = trainer.train(data, num_iters=30)
    assert len(report.losses) == 30
    assert np.isfinite(report.losses).all()
    assert report.hit_rate > 0.5  # long-tail + warmup must give decent hit rate

    metrics = trainer.evaluate(eval_data)
    assert metrics["count"] == 5 * cfg.batch_size
    assert metrics["auroc"] > max(untrained + 0.03, 0.55), (untrained, metrics)


def test_training_lifts_auroc_bf16():
    """bf16 towers + bf16 cache (the bench configuration) must still learn."""
    tables = [1000, 2000, 500, 300]
    cfg = _cfg(tables, prefetch_num=2)
    cfg.learning_rate = 0.3
    cfg.compute_dtype = "bfloat16"
    # 48 iters (not 30): the short-horizon AUROC sits right at the 0.58 bar
    # (0.578-0.62 across dense-init draws); a few more steps clear it for any
    # seed without weakening the assertion.
    data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=48, dense_in_features=4, seed=3
    )
    eval_data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=5, dense_in_features=4, seed=99
    )
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    trainer.train(data, num_iters=48)
    metrics = trainer.evaluate(eval_data)
    assert metrics["auroc"] > 0.58, metrics


def test_prefetch_equivalence():
    """prefetch_num>1 must produce numerically identical training to prefetch_num=1
    (far-sighted prefetch only moves cache maintenance, not semantics)."""
    tables = [500, 400]
    runs = []
    for pn in (1, 3):
        cfg = _cfg(tables, prefetch_num=pn, use_lfu_eviction=True, use_freq=False)
        cfg.cache.cache_ratio = 0.9  # window working set must fit for exact equivalence
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=9, dense_in_features=4, seed=5
        )
        trainer = CachedDLRMTrainer(cfg)
        report = trainer.train(data, num_iters=9)
        runs.append(report.losses)
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-5)


def test_prefetch16_equivalence_with_churn():
    """prefetch_num=16 (the deep-window wire lever) through EVICTION churn:
    losses identical to prefetch_num=2 on the same stream — the cache only
    moves rows, so window depth must never change numerics even when rows
    evict, write back, and re-admit between windows."""
    tables = [2000, 1500]
    runs = []
    for pn in (2, 16):
        cfg = _cfg(
            tables, prefetch_num=pn, use_lfu_eviction=True, use_freq=False,
            planner="host",
        )
        # capacity must cover the 16-batch window working set (the planner
        # raises CapacityError otherwise) while still forcing churn
        cfg.cache.cache_ratio = 0.45
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=32, dense_in_features=4, seed=5
        )
        trainer = CachedDLRMTrainer(cfg)
        report = trainer.train(data, num_iters=32)
        assert trainer.embed.stats.swap_out_bytes > 0, "no churn exercised"
        runs.append(report.losses)
    np.testing.assert_allclose(runs[0], runs[1], rtol=1e-5)


def test_lfu_vs_dataset_both_train():
    tables = [800, 800]
    for kw in (dict(use_lfu_eviction=True, use_freq=False), dict(use_lfu_eviction=False)):
        cfg = _cfg(tables, **kw)
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=6, dense_in_features=4, seed=11
        )
        freq = data.id_freq_map() if not kw.get("use_lfu_eviction") else None
        trainer = CachedDLRMTrainer(cfg, id_freq_map=freq)
        report = trainer.train(data, num_iters=6)
        assert np.isfinite(report.losses).all()


def test_packed_window_matches_device_planner():
    """The packed single-transfer window path (host planner) must train
    numerically identically to the device planner's unpacked per-window path —
    pack/unpack and planner choice are pure plumbing."""
    tables = [700, 300]
    runs = []
    for planner in ("host", "device"):
        cfg = _cfg(tables, prefetch_num=2, use_lfu_eviction=True, use_freq=False)
        cfg.cache.cache_ratio = 0.9
        cfg.cache.planner = planner
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=6, dense_in_features=4, seed=13
        )
        trainer = CachedDLRMTrainer(cfg)
        if planner == "host":
            assert trainer.embed._dir is not None
        report = trainer.train(data, num_iters=6)
        runs.append(report.losses)
    np.testing.assert_allclose(runs[0], runs[1], rtol=2e-5)


def test_packed_window_odd_length_ids():
    """Regression: 20-bit id packing pairs ids, so it must not be selected when
    the PER-STEP id count L is odd (capacity in (2^16, 2^20] + odd F*B used to
    decode every downstream block at wrong offsets). Host-planner packed path
    must match the device planner exactly."""
    tables = [70_000, 30_000, 30_000]  # capacity 117k: 20-bit candidate range
    runs = []
    for planner in ("host", "device"):
        cfg = DLRMConfig(
            num_embeddings_per_feature=tables,
            embedding_dim=16,
            dense_in_features=4,
            dense_arch_layer_sizes=(32, 16),
            over_arch_layer_sizes=(32, 16, 1),
            batch_size=85,  # L = 3 * 85 = 255, odd
            learning_rate=0.5,
            cache=CacheConfig(
                cache_ratio=0.9, warmup_ratio=0.7, buffer_size=0,
                prefetch_num=2, use_lfu_eviction=True, use_freq=False,
                planner=planner,
            ),
        )
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=6, dense_in_features=4, seed=17
        )
        trainer = CachedDLRMTrainer(cfg)
        report = trainer.train(data, num_iters=6)
        assert np.isfinite(report.losses).all()
        runs.append(report.losses)
    # planners may assign different slots -> different f32 summation order;
    # pre-fix this diverged to garbage (decoded blocks at wrong offsets)
    np.testing.assert_allclose(runs[0], runs[1], rtol=2e-4)


def test_int8_dense_inputs_learn():
    """int8 dense-feature transfers (quartered input-link bytes) must retain
    the AUROC lift of the f32 path on the same data."""
    tables = [1000, 2000, 500, 300]
    aurocs = {}
    for dmode in ("float32", "int8"):
        cfg = _cfg(tables, prefetch_num=2)
        cfg.learning_rate = 0.3
        cfg.dense_input_dtype = dmode
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=30, dense_in_features=4, seed=3
        )
        eval_data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=5, dense_in_features=4, seed=99
        )
        trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
        trainer.train(data, num_iters=30)
        aurocs[dmode] = trainer.evaluate(eval_data)["auroc"]
    assert aurocs["int8"] > aurocs["float32"] - 0.01, aurocs


def test_int4_dense_inputs_learn():
    """int4 dense-feature transfers (eighth of the f32 input-link bytes,
    per-feature scales) must retain the AUROC lift of the f32 path on the
    same data. Odd dense_in_features exercises the nibble padding."""
    tables = [1000, 2000, 500, 300]
    aurocs = {}
    for dmode in ("float32", "int4"):
        cfg = _cfg(tables, prefetch_num=2)
        cfg.learning_rate = 0.3
        cfg.dense_input_dtype = dmode
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=30, dense_in_features=5, seed=3
        )
        eval_data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=5, dense_in_features=5, seed=99
        )
        trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
        trainer.train(data, num_iters=30)
        aurocs[dmode] = trainer.evaluate(eval_data)["auroc"]
    assert aurocs["int4"] > aurocs["float32"] - 0.015, aurocs
