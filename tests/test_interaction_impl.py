"""interaction_impl="gather" must match the bmm interaction numerically:
same pairwise dots (f32 accumulation either way) and the same custom-VJP
mixed-precision gradient recipe (cotangent rounded to the operand dtype,
symmetrized, grad-dot in the compute dtype)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cachedembedding_tpu.models import dlrm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gather_interaction_matches_bmm(dtype):
    rng = np.random.default_rng(0)
    B, F, D = 64, 9, 16
    sparse = jnp.asarray(rng.normal(size=(B, F, D)), dtype)
    dense = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)

    outs, grads = {}, {}
    for impl in ("bmm", "gather"):
        dlrm.INTERACTION_IMPL = impl

        def f(s):
            return dlrm.interaction_arch(dense, s, dtype=dtype).sum()

        outs[impl] = dlrm.interaction_arch(dense, sparse, dtype=dtype)
        grads[impl] = jax.grad(f)(sparse)
    dlrm.INTERACTION_IMPL = "bmm"
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(outs["bmm"], np.float32),
        np.asarray(outs["gather"], np.float32), rtol=tol, atol=tol,
    )
    np.testing.assert_allclose(
        np.asarray(grads["bmm"], np.float32),
        np.asarray(grads["gather"], np.float32), rtol=tol, atol=tol,
    )


def test_gather_interaction_trains():
    from cachedembedding_tpu.config import CacheConfig, DLRMConfig
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = [900, 400]
    cfg = DLRMConfig(
        num_embeddings_per_feature=tables, embedding_dim=16,
        dense_in_features=4, dense_arch_layer_sizes=(16, 16),
        over_arch_layer_sizes=(16, 1), batch_size=128, learning_rate=0.3,
        interaction_impl="gather",
        cache=CacheConfig(cache_ratio=0.5, prefetch_num=2),
    )
    data = SyntheticLongTailDataset(tables, 128, 8, dense_in_features=4, seed=2)
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    report = trainer.train(data, num_iters=8)
    assert np.isfinite(np.asarray(report.losses)).all()
    # module flag restored for other tests
    dlrm.INTERACTION_IMPL = "bmm"
