"""Binned MXU scatter-add (ops/binned_scatter.py) vs the XLA `.at[].add`
ground truth — the backward of the embedding gather
(/root/reference/benchmark/benchmark_cache.py:62's CUDA EmbeddingBag bwd)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cachedembedding_tpu.ops.binned_scatter import (
    binned_scatter_add,
    sort_plan_np,
)


def _scatter_ref(v, g, num_rows):
    out = np.zeros((num_rows, g.shape[1]), np.float32)
    np.add.at(out, v, g.astype(np.float32))
    return out


@pytest.mark.parametrize("L,num_rows,D", [(1000, 700, 128), (4096, 2048, 128)])
@pytest.mark.parametrize("dtype", [np.float32, "bfloat16"])
def test_matches_xla_scatter(L, num_rows, D, dtype):
    rng = np.random.default_rng(0)
    v = rng.integers(0, num_rows, size=(L,)).astype(np.int32)
    g = rng.standard_normal((L, D)).astype(np.float32)
    if dtype == "bfloat16":
        import ml_dtypes

        g = g.astype(ml_dtypes.bfloat16)
    perm, v_sorted, bin_starts = sort_plan_np(v, num_rows)
    out = binned_scatter_add(
        jnp.asarray(g), jnp.asarray(perm), jnp.asarray(v_sorted),
        jnp.asarray(bin_starts), num_rows, interpret=True,
    )
    ref = _scatter_ref(v, np.asarray(g, np.float32), num_rows)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_heavy_duplicates():
    """Zipf-like stream: most elements hit the first few rows (one bin holds
    nearly everything) — exercises multi-chunk bins and exact duplicate
    accumulation."""
    rng = np.random.default_rng(1)
    L, num_rows, D = 8192, 512, 128
    # 80% of ids in [0, 8): extreme head concentration
    head = rng.integers(0, 8, size=(int(L * 0.8),))
    tail = rng.integers(0, num_rows, size=(L - head.size,))
    v = np.concatenate([head, tail])
    rng.shuffle(v)
    v = v.astype(np.int32)
    g = rng.standard_normal((L, D)).astype(np.float32)
    perm, v_sorted, bin_starts = sort_plan_np(v, num_rows)
    out = binned_scatter_add(
        jnp.asarray(g), jnp.asarray(perm), jnp.asarray(v_sorted),
        jnp.asarray(bin_starts), num_rows, interpret=True,
    )
    ref = _scatter_ref(v, g, num_rows)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-3)


def test_empty_bins_and_unaligned_rows():
    """num_rows not a multiple of block_rows; some bins with zero elements."""
    rng = np.random.default_rng(2)
    L, num_rows, D = 777, 1000, 128
    v = rng.choice([3, 4, 700, 999], size=(L,)).astype(np.int32)  # sparse bins
    g = rng.standard_normal((L, D)).astype(np.float32)
    perm, v_sorted, bin_starts = sort_plan_np(v, num_rows)
    out = binned_scatter_add(
        jnp.asarray(g), jnp.asarray(perm), jnp.asarray(v_sorted),
        jnp.asarray(bin_starts), num_rows, interpret=True,
    )
    ref = _scatter_ref(v, g, num_rows)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)
    # untouched rows must be exactly zero
    untouched = np.setdiff1d(np.arange(num_rows), np.unique(v))
    assert np.all(np.asarray(out)[untouched] == 0)


@pytest.mark.parametrize("cw_dtype", ["float32", "bfloat16"])
def test_fused_sgd_update(cw_dtype):
    """binned_sgd_update == cw.at[v].add(-lr*g) with one storage rounding."""
    import ml_dtypes

    from cachedembedding_tpu.ops.binned_scatter import binned_sgd_update

    rng = np.random.default_rng(3)
    L, C, D = 3000, 1500, 128
    v = rng.integers(0, C, size=(L,)).astype(np.int32)
    g = rng.standard_normal((L, D)).astype(np.float32)
    cw = rng.standard_normal((C, D)).astype(np.float32)
    if cw_dtype == "bfloat16":
        cw = cw.astype(ml_dtypes.bfloat16)
    lr = 0.37
    perm, grouped, bins = sort_plan_np(v, C)
    out = binned_sgd_update(
        jnp.asarray(cw), jnp.asarray(g), jnp.asarray(perm),
        jnp.asarray(grouped), jnp.asarray(bins),
        jnp.asarray(lr, jnp.float32), interpret=True,
    )
    ref = np.asarray(cw, np.float32) - lr * _scatter_ref(v, g, C)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(jnp.asarray(ref).astype(out.dtype).astype(jnp.float32)),
        rtol=2e-2 if cw_dtype == "bfloat16" else 1e-5,
        atol=1e-2 if cw_dtype == "bfloat16" else 1e-4,
    )
    # untouched rows pass through exactly
    untouched = np.setdiff1d(np.arange(C), np.unique(v))
    if untouched.size:
        np.testing.assert_array_equal(
            np.asarray(out)[untouched], np.asarray(cw)[untouched]
        )
