"""ship_sort_perm: the Pallas binned MXU scatter-add backward wired through
the fused-window trainer — numerics must match the XLA scatter path on the
same stream (summation order differs, so tolerances are f32-roundoff level)."""

import numpy as np
import pytest

from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

TABLES = [900, 400, 80, 40]


def _cfg(ship, resident_threshold=0, **kw):
    return DLRMConfig(
        num_embeddings_per_feature=TABLES,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=128,
        learning_rate=0.5,
        compute_dtype="float32",
        cache=CacheConfig(
            cache_ratio=0.6, warmup_ratio=0.5, buffer_size=0, prefetch_num=2,
            planner="host", cache_dtype="float32",
            ship_sort_perm=ship, resident_threshold=resident_threshold,
        ),
        **kw,
    )


def _run(ship, resident_threshold=0, pooling=1, n=6, **kw):
    cfg = _cfg(ship, resident_threshold, **kw)
    data = SyntheticLongTailDataset(
        TABLES, cfg.batch_size, num_batches=n, dense_in_features=4, seed=5,
        pooling_factor=pooling,
    )
    tr = CachedDLRMTrainer(cfg)
    rep = tr.train(data, num_iters=n)
    ev = tr.evaluate(
        SyntheticLongTailDataset(
            TABLES, cfg.batch_size, num_batches=2, dense_in_features=4,
            seed=77, pooling_factor=pooling,
        )
    )
    return np.asarray(rep.losses), ev["auroc"], tr.embed.dense_weight()


@pytest.mark.parametrize("pooling", [1, 2])
def test_matches_xla_scatter_path(pooling):
    l0, a0, w0 = _run(False, pooling=pooling)
    l1, a1, w1 = _run(True, pooling=pooling)
    assert np.isfinite(l1).all()
    np.testing.assert_allclose(l1, l0, rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(a1, a0, atol=1e-3)
    np.testing.assert_allclose(w1, w0, rtol=3e-3, atol=2e-5)


def test_with_mixed_kernel_resident():
    """Resident region appended after the cache slots: the plan covers the
    whole device array address space."""
    l0, a0, w0 = _run(False, resident_threshold=100)
    l1, a1, w1 = _run(True, resident_threshold=100)
    np.testing.assert_allclose(l1, l0, rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(w1, w0, rtol=3e-3, atol=2e-5)


def test_with_adagrad():
    l1, a1, _ = _run(True, embedding_optimizer="rowwise_adagrad")
    assert np.isfinite(l1).all()
    assert l1[-2:].mean() < l1[:2].mean()
