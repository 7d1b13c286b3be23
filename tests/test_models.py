import numpy as np
import jax
import jax.numpy as jnp

from cachedembedding_tpu.models.dlrm import (
    bce_with_logits,
    choose,
    dlrm_dense_forward,
    init_dlrm_dense,
    interaction_arch,
)


def test_interaction_shape_and_values():
    B, F, D = 5, 3, 4
    rng = np.random.default_rng(0)
    dense = rng.random((B, D)).astype(np.float32)
    sparse = rng.random((B, F, D)).astype(np.float32)
    out = np.asarray(interaction_arch(jnp.asarray(dense), jnp.asarray(sparse)))
    assert out.shape == (B, D + choose(F + 1, 2))
    # manual pairwise dots for sample 0
    comb = np.concatenate([dense[0:1], sparse[0]], axis=0)  # (F+1, D)
    dots = comb @ comb.T
    iu = np.triu_indices(F + 1, k=1)
    np.testing.assert_allclose(out[0], np.concatenate([dense[0], dots[iu]]), rtol=1e-5)


def test_dlrm_forward_shapes():
    key = jax.random.PRNGKey(0)
    B, F, D, Din = 8, 26, 16, 13
    params = init_dlrm_dense(key, D, F, Din, (32, 16), (32, 16, 1))
    dense = jnp.ones((B, Din))
    sparse = jnp.ones((B, F, D))
    logits = dlrm_dense_forward(params, dense, sparse)
    assert logits.shape == (B,)


def test_dlrm_no_dense_branch():
    key = jax.random.PRNGKey(0)
    B, F, D = 4, 5, 8
    params = init_dlrm_dense(key, D, F, 0, (), (16, 8, 1))
    sparse = jnp.ones((B, F, D))
    logits = dlrm_dense_forward(params, None, sparse)
    assert logits.shape == (B,)


def test_bce_matches_reference_formula():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=32).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, 32).astype(np.float32))
    loss = float(bce_with_logits(logits, labels))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    ref = -np.mean(
        np.asarray(labels) * np.log(p) + (1 - np.asarray(labels)) * np.log(1 - p)
    )
    assert abs(loss - ref) < 1e-5


def test_dlrm_gradients_flow():
    key = jax.random.PRNGKey(0)
    B, F, D, Din = 4, 3, 8, 5
    params = init_dlrm_dense(key, D, F, Din, (16, 8), (16, 1))
    dense = jnp.ones((B, Din))
    sparse = jnp.ones((B, F, D))
    labels = jnp.ones((B,))

    def loss(p, s):
        return bce_with_logits(dlrm_dense_forward(p, dense, s), labels)

    g_params, g_sparse = jax.grad(loss, argnums=(0, 1))(params, sparse)
    assert g_sparse.shape == sparse.shape
    assert float(jnp.abs(g_sparse).sum()) > 0
    for layer in g_params.dense_arch + g_params.over_arch:
        assert float(jnp.abs(layer["w"]).sum()) > 0
