"""Stochastic rounding (ops/rounding.py): unbiasedness, neighbor exactness,
and the fp8 small-LR accumulation property deterministic rounding lacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cachedembedding_tpu.ops.rounding import (
    _stochastic_astype_emulated,
    stochastic_astype,
)


@pytest.mark.parametrize("dt,ulp_rel,ulp_abs", [
    (jnp.bfloat16, 2.0 ** -7, 1e-5),
    (jnp.float8_e4m3fn, 2.0 ** -2, 2.0 ** -9),  # abs floor: subnormal step
])
def test_rounds_to_adjacent_representables(dt, ulp_rel, ulp_abs):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 128)) * 3).astype(np.float32)
    out = np.asarray(
        stochastic_astype(jnp.asarray(x), dt, 7).astype(jnp.float32)
    )
    # output must be representable in the target dtype...
    back = np.asarray(jnp.asarray(out).astype(dt).astype(jnp.float32))
    np.testing.assert_array_equal(out, back)
    # ...and within one target-dtype ulp of x (= at most the far neighbor)
    bound = ulp_rel * np.maximum(np.abs(x), np.abs(out)) + ulp_abs + 1e-7
    assert np.all(np.abs(out - x) <= bound)


@pytest.mark.parametrize("dt", [jnp.bfloat16, jnp.float8_e4m3fn])
def test_unbiased(dt):
    """Mean over many seeds converges to x (the whole point)."""
    x = jnp.full((4, 128), 1.0 + 1.0 / 32.0, jnp.float32)  # between fp8 reps
    acc = np.zeros((4, 128), np.float64)
    n = 200
    for s in range(n):
        acc += np.asarray(
            stochastic_astype(x, dt, s).astype(jnp.float32), np.float64
        )
    mean = acc / n
    # per-element: within 5 sigma of a Bernoulli mean over n draws
    np.testing.assert_allclose(mean, np.asarray(x), rtol=0, atol=0.025)
    # global mean over 512 elements x n draws: tight
    np.testing.assert_allclose(mean.mean(), float(x[0, 0]), rtol=0, atol=0.002)


def test_exact_values_stay_exact():
    x = jnp.asarray([[1.0, 0.5, -2.0, 0.0] * 32], jnp.float32)
    for s in range(5):
        out = stochastic_astype(x, jnp.float8_e4m3fn, s).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_fp8_small_update_accumulates():
    """THE motivating property: repeated sub-ulp updates vanish under
    deterministic round-to-nearest but accumulate in expectation under
    stochastic rounding (TODO #7 / VERDICT round-2 weak #5)."""
    D = 128
    w = jnp.full((8, D), 1.0, jnp.float32)  # fp8 ulp at 1.0 is 0.125
    delta = 0.01  # << ulp/2: deterministic rounding always snaps back
    steps = 100

    w_det = w.astype(jnp.float8_e4m3fn)
    for _ in range(steps):
        w_det = (w_det.astype(jnp.float32) + delta).astype(jnp.float8_e4m3fn)
    det_drift = float(jnp.mean(w_det.astype(jnp.float32))) - 1.0

    w_sto = w.astype(jnp.float8_e4m3fn)
    for s in range(steps):
        w_sto = stochastic_astype(
            w_sto.astype(jnp.float32) + delta, jnp.float8_e4m3fn, s
        )
    sto_drift = float(jnp.mean(w_sto.astype(jnp.float32))) - 1.0

    assert det_drift == 0.0, "deterministic rounding should stagnate"
    # expected drift = steps * delta = 1.0; accept half of it
    assert sto_drift > 0.5, f"stochastic rounding failed to accumulate: {sto_drift}"


def test_trainer_fp8_stochastic_path_trains():
    """End-to-end: fp8 cache + stochastic rounding through the fused window
    trainer on a tiny stream — finite losses, loss decreases."""
    from cachedembedding_tpu.config import CacheConfig, DLRMConfig
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = [700, 300]
    cfg = DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(32, 16),
        over_arch_layer_sizes=(32, 16, 1),
        batch_size=128,
        learning_rate=0.5,
        cache=CacheConfig(
            cache_ratio=0.5, warmup_ratio=0.5, buffer_size=0, prefetch_num=2,
            planner="host", cache_dtype="float8_e4m3fn",
            stochastic_rounding="on",
        ),
    )
    data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=6, dense_in_features=4, seed=3
    )
    tr = CachedDLRMTrainer(cfg)
    rep = tr.train(data, num_iters=6)
    assert np.isfinite(rep.losses).all()
    assert np.mean(rep.losses[-2:]) < np.mean(rep.losses[:2])
