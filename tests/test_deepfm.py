import numpy as np
import jax
import jax.numpy as jnp

from cachedembedding_tpu.models.deepfm import (
    DeepFMParams,
    bce_probs,
    deepfm_forward,
    factorization_machine,
    init_deepfm,
)


def test_fm_matches_pairwise_dots():
    rng = np.random.default_rng(0)
    x = rng.random((4, 5, 3)).astype(np.float32)
    out = np.asarray(factorization_machine(jnp.asarray(x)))
    # FM order-2 term == sum of pairwise dots over features
    for b in range(4):
        dots = 0.0
        for i in range(5):
            for j in range(i + 1, 5):
                dots += x[b, i] @ x[b, j]
        np.testing.assert_allclose(out[b, 0], dots, rtol=1e-5)


def test_deepfm_forward_shape_and_range():
    key = jax.random.PRNGKey(0)
    B, F, D = 6, 4, 8
    params = init_deepfm(key, D, F, 3, hidden_layer_size=16, deep_fm_dimension=5)
    probs = deepfm_forward(params, jnp.ones((B, 3)), jnp.ones((B, F, D)))
    assert probs.shape == (B,)
    p = np.asarray(probs)
    assert ((p > 0) & (p < 1)).all()


def test_deepfm_trains():
    key = jax.random.PRNGKey(1)
    B, F, D = 64, 3, 8
    params = init_deepfm(key, D, F, 2, 16, 4)
    rng = np.random.default_rng(0)
    dense = jnp.asarray(rng.random((B, 2)).astype(np.float32))
    sparse = jnp.asarray(rng.random((B, F, D)).astype(np.float32) * 0.1)
    labels = jnp.asarray((rng.random(B) < 0.5).astype(np.float32))

    def loss_fn(p):
        return bce_probs(deepfm_forward(p, dense, sparse), labels)

    l0 = float(loss_fn(params))
    for _ in range(20):
        g = jax.grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, gg: p - 0.5 * gg, params, g)
    assert float(loss_fn(params)) < l0


def test_deepfm_trains_through_cached_trainer():
    """DeepFM as the model family of the full cached pipeline (reference runs
    SimpleDeepFMNN through the same harness, baselines/dlrm_main.py:684-688)."""
    from cachedembedding_tpu.config import CacheConfig, DLRMConfig
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = [500, 300]
    cfg = DLRMConfig(
        model="deepfm",
        deep_fm_dimension=8,
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        batch_size=128,
        learning_rate=0.1,
        cache=CacheConfig(cache_ratio=0.5, prefetch_num=2, use_freq=False,
                          use_lfu_eviction=True, buffer_size=0),
    )
    data = SyntheticLongTailDataset(tables, cfg.batch_size, 8, dense_in_features=4, seed=2)
    trainer = CachedDLRMTrainer(cfg)
    report = trainer.train(data, num_iters=8)
    assert np.isfinite(report.losses).all()
    metrics = trainer.evaluate(
        SyntheticLongTailDataset(tables, cfg.batch_size, 2, dense_in_features=4, seed=3)
    )
    assert 0.0 <= metrics["auroc"] <= 1.0
