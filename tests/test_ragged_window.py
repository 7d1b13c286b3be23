"""Ragged (variable-pooling) window fusion: the fbgemm-trace workload
(/root/reference/baselines/data/synth.py:69) must train through the SAME
one-transfer-one-execute window pipeline as uniform batches, numerically
matching the per-batch fallback path."""

import numpy as np

from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synth import SynthTraceDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer


def _traces(seed=0, n_tables=3, n_bags=4096, max_len=6, rows=500):
    rng = np.random.default_rng(seed)
    traces, sizes = [], []
    for _ in range(n_tables):
        lengths = rng.integers(0, max_len, n_bags)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        # zipf-ish ids for realistic cache behavior
        u = rng.random(offsets[-1])
        ids = np.minimum((rows * u ** 2.0).astype(np.int64), rows - 1)
        traces.append((ids, offsets))
        sizes.append(rows)
    return traces, sizes


def _cfg(tables, planner, cache_ratio=0.9, cache_kw_extra=None, **kw):
    return DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=64,
        learning_rate=0.5,
        cache=CacheConfig(
            cache_ratio=cache_ratio, warmup_ratio=0.0, buffer_size=0,
            prefetch_num=2, use_lfu_eviction=True, use_freq=False,
            planner=planner, **(cache_kw_extra or {}),
        ),
        **kw,
    )


def _run(planner, seed=5, n=6, cache_kw_extra=None, **kw):
    traces, sizes = _traces(seed)
    cfg = _cfg(sizes, planner, cache_kw_extra=cache_kw_extra, **kw)
    data = SynthTraceDataset(
        traces, sizes, batch_size=cfg.batch_size, num_batches=n,
        dense_in_features=4,
    )
    trainer = CachedDLRMTrainer(cfg)
    if planner == "host":
        # the fused ragged path must actually engage
        pw, sv = trainer._begin_window(list(data)[:2])
        assert isinstance(sv, tuple) and sv[0] == "ragged", sv[0]
        trainer._finish_window(pw)
        trainer.embed.reset_cache()
    rep = trainer.train(data, num_iters=n)
    ev = trainer.evaluate(
        SynthTraceDataset(traces, sizes, batch_size=cfg.batch_size,
                          num_batches=2, dense_in_features=4, seed=99)
    )
    return rep, ev


def test_ragged_window_fusion_matches_fallback():
    rep_fused, ev_fused = _run("host")
    rep_fall, ev_fall = _run("device")
    assert np.isfinite(rep_fused.losses).all()
    np.testing.assert_allclose(rep_fused.losses, rep_fall.losses, rtol=2e-4)
    np.testing.assert_allclose(ev_fused["auroc"], ev_fall["auroc"], atol=2e-3)


def test_ragged_window_with_evictions():
    # cache sized above the per-window working set but well below total rows
    rep, ev = _run("host", cache_ratio=0.5)
    assert np.isfinite(rep.losses).all()
    assert np.isfinite(ev["auroc"])


def test_ragged_window_adagrad():
    rep, _ = _run("host", embedding_optimizer="rowwise_adagrad")
    assert np.isfinite(rep.losses).all()


def test_ragged_window_mean_mode():
    rep, _ = _run("host", reduction_mode="mean")
    assert np.isfinite(rep.losses).all()


def test_ragged_window_with_resident_split():
    """Ragged fused windows + mixed-kernel resident region together."""
    rng = np.random.default_rng(9)
    sizes = [800, 60, 30]  # tables 1,2 resident under threshold 100
    traces = []
    for rows in sizes:
        lengths = rng.integers(0, 5, 2048)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        u = rng.random(offsets[-1])
        ids = np.minimum((rows * u ** 2.0).astype(np.int64), rows - 1)
        traces.append((ids, offsets))
    runs = []
    for thr in (0, 100):
        cfg = _cfg(sizes, "host", cache_ratio=0.9)
        cfg.cache.resident_threshold = thr
        data = SynthTraceDataset(
            traces, sizes, batch_size=cfg.batch_size, num_batches=6,
            dense_in_features=4,
        )
        trainer = CachedDLRMTrainer(cfg)
        if thr:
            assert trainer.embed.resident_tables == [1, 2]
        rep = trainer.train(data, num_iters=6)
        assert np.isfinite(rep.losses).all()
        runs.append(rep.losses)
    # same canonical init + big-enough cache: resident split is transparent
    np.testing.assert_allclose(runs[0], runs[1], rtol=2e-4)


def test_ragged_window_int8_transfer():
    rep, ev = _run("host", cache_ratio=0.5, seed=11,
                   cache_kw_extra=dict(transfer_dtype="int8"))
    assert np.isfinite(rep.losses).all()
