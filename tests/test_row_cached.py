"""Row-sharded CACHED embedding (parallel/row_cached.py) — the >=2-host shape:
host-DRAM master sharded row-wise, per-host directory + HBM cache over
locally-owned rows, owner-routed id exchange. Ground truth: single-host cached
training on the SAME stream must produce identical losses and identical
flushed master weights (cache placement must never change numerics).

Reference analogs: torchrec ROW_WISE sharding
(/root/reference/baselines/dlrm_main.py:709-721) + multi-GPU
ParallelCachedEmbeddingBag (/root/reference/recsys/models/dlrm.py:70-82)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cachedembedding_tpu.cache.manager import CachedEmbeddingBag
from cachedembedding_tpu.cache.state import EvictionStrategy
from cachedembedding_tpu.models.dlrm import init_dlrm_dense
from cachedembedding_tpu.parallel.mesh import AXIS, make_mesh
from cachedembedding_tpu.parallel.row_cached import (
    RowShardedCachedEmbeddingBag,
    build_rowwise_cached_step,
)

N, D, F, POOL = 4096, 32, 4, 1
B_GLOBAL = 64
DIN = 8


def _stream(n_steps, seed=5):
    rng = np.random.default_rng(seed)
    ids = (rng.zipf(1.3, size=(n_steps, F * B_GLOBAL * POOL)) - 1) % N
    dense = rng.standard_normal((n_steps, B_GLOBAL, DIN)).astype(np.float32)
    labels = (rng.random((n_steps, B_GLOBAL)) < 0.3).astype(np.float32)
    return ids.astype(np.int64), dense, labels


def _init_weight(seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((N, D)).astype(np.float32) * 0.05


def _single_host_losses(ids, dense, labels, w0, lr, n_steps, cap_total):
    """Reference: single CachedEmbeddingBag + same dense towers, global batch."""
    from cachedembedding_tpu.train.trainer import _model_loss

    bag = CachedEmbeddingBag(
        N, D, cuda_row_num=cap_total, initial_weight=w0,
        evict_strategy=EvictionStrategy.LFU, planner="host", buffer_size=0,
    )
    key = jax.random.PRNGKey(0)
    dp = init_dlrm_dense(key, D, F, DIN, (16, D), (16, 8, 1))

    @jax.jit
    def step(dp, cw, slots, d, l):
        def loss_fn(dp_, cw_):
            rows = jnp.take(cw_, slots, axis=0).reshape(F, B_GLOBAL, POOL, D)
            emb = jnp.transpose(rows.sum(axis=2), (1, 0, 2))
            return _model_loss("dlrm", dp_, d, emb, jnp.float32, l)

        loss, (gd, gc) = jax.value_and_grad(loss_fn, argnums=(0, 1))(dp, cw)
        dp = jax.tree_util.tree_map(lambda p, g: p - lr * g, dp, gd)
        return dp, cw - lr * gc, loss

    losses = []
    for t in range(n_steps):
        slots = np.asarray(bag.prepare_ids(ids[t]))
        dp, bag.cache_weight, loss = step(
            dp, bag.cache_weight, jnp.asarray(slots), jnp.asarray(dense[t]),
            jnp.asarray(labels[t]),
        )
        losses.append(float(loss))
    bag.flush()
    w = np.asarray(bag.dense_weight())
    return losses, w


@pytest.mark.parametrize("world", [2, 4])
def test_rowwise_cached_equals_single_host(world):
    n_steps = 6
    lr = 0.5
    ids, dense, labels = _stream(n_steps)
    w0 = _init_weight()
    mesh = make_mesh(world)
    # per-shard capacity * world == single-host capacity for a fair twin;
    # placement differs but cache residency must not affect numerics
    cap_shard = 192
    sharded = RowShardedCachedEmbeddingBag(
        N, D, mesh=mesh, cuda_row_num=cap_shard, initial_weight=w0,
        evict_strategy=EvictionStrategy.LFU, buffer_size=0,
    )
    step = build_rowwise_cached_step(
        mesh, num_features=F, global_batch=B_GLOBAL, pooling=POOL,
        capacity=cap_shard, model="dlrm",
    )
    key = jax.random.PRNGKey(0)
    dp = init_dlrm_dense(key, D, F, DIN, (16, D), (16, 8, 1))
    B_local = B_GLOBAL // world
    lrj = jnp.asarray(lr, jnp.float32)

    losses = []
    cache = sharded.global_cache()
    for t in range(n_steps):
        # per-rank id streams: rank r owns batch rows [r*B_local, (r+1)*B_local)
        # of the global batch — feature-major layout per rank
        fb = ids[t].reshape(F, B_GLOBAL, POOL)
        per_rank = np.stack(
            [fb[:, r * B_local : (r + 1) * B_local].reshape(-1) for r in range(world)]
        )
        enc = sharded.prepare_ids_per_rank(per_rank)
        cache = sharded.global_cache()
        d = dense[t].reshape(world, B_local, DIN)
        l = labels[t].reshape(world, B_local)
        dp, cache, loss = step(
            dp, cache, jnp.asarray(enc), jnp.asarray(d), jnp.asarray(l),
            lrj, lrj,
        )
        sharded.sync_shards(cache)
        losses.append(float(loss))

    ref_losses, ref_w = _single_host_losses(
        ids, dense, labels, w0, lr, n_steps, cap_total=cap_shard * world
    )
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)
    w = sharded.dense_weight()
    np.testing.assert_allclose(w, ref_w, rtol=1e-4, atol=1e-5)


def test_rowwise_cached_eviction_coherence():
    """Tiny per-shard caches force constant eviction churn; flushed master must
    still match the single-host twin (writeback coherence across shards)."""
    n_steps = 8
    lr = 0.3
    ids, dense, labels = _stream(n_steps, seed=11)
    w0 = _init_weight(seed=12)
    world = 4
    mesh = make_mesh(world)
    cap_shard = 96  # small enough for churn, >= per-step shard working set
    sharded = RowShardedCachedEmbeddingBag(
        N, D, mesh=mesh, cuda_row_num=cap_shard, initial_weight=w0,
        evict_strategy=EvictionStrategy.LFU, buffer_size=0,
    )
    step = build_rowwise_cached_step(
        mesh, num_features=F, global_batch=B_GLOBAL, pooling=POOL,
        capacity=cap_shard, model="dlrm",
    )
    key = jax.random.PRNGKey(0)
    dp = init_dlrm_dense(key, D, F, DIN, (16, D), (16, 8, 1))
    B_local = B_GLOBAL // world
    lrj = jnp.asarray(lr, jnp.float32)
    for t in range(n_steps):
        fb = ids[t].reshape(F, B_GLOBAL, POOL)
        per_rank = np.stack(
            [fb[:, r * B_local : (r + 1) * B_local].reshape(-1) for r in range(world)]
        )
        enc = sharded.prepare_ids_per_rank(per_rank)
        cache = sharded.global_cache()
        d = dense[t].reshape(world, B_local, DIN)
        l = labels[t].reshape(world, B_local)
        dp, cache, loss = step(
            dp, cache, jnp.asarray(enc), jnp.asarray(d), jnp.asarray(l),
            lrj, lrj,
        )
        sharded.sync_shards(cache)
        assert np.isfinite(loss)
    st = sharded.aggregate_stats()
    assert sum(st.num_write_back_history) > 0, "no churn — capacity too big"
    ref_losses, ref_w = _single_host_losses(
        ids, dense, labels, w0, lr, n_steps, cap_total=cap_shard * world
    )
    np.testing.assert_allclose(sharded.dense_weight(), ref_w, rtol=1e-4, atol=1e-5)


def test_rowwise_windowed_equals_single_host():
    """The WINDOWED rowwise path (one plan + one shard_map scan per prefetch
    window, build_rowwise_cached_window) must match the per-batch single-host
    twin: window planning only moves admission earlier, never changes values."""
    from cachedembedding_tpu.parallel.row_cached import (
        build_rowwise_cached_window,
    )

    n_steps, PN = 6, 3
    lr = 0.5
    ids, dense, labels = _stream(n_steps, seed=31)
    w0 = _init_weight(seed=32)
    world = 4
    mesh = make_mesh(world)
    cap_shard = 256  # must cover the 3-batch window working set per shard
    sharded = RowShardedCachedEmbeddingBag(
        N, D, mesh=mesh, cuda_row_num=cap_shard, initial_weight=w0,
        evict_strategy=EvictionStrategy.LFU, buffer_size=0,
    )
    wstep = build_rowwise_cached_window(
        mesh, num_features=F, global_batch=B_GLOBAL, pooling=POOL,
        capacity=cap_shard, model="dlrm",
    )
    key = jax.random.PRNGKey(0)
    dp = init_dlrm_dense(key, D, F, DIN, (16, D), (16, 8, 1))
    B_local = B_GLOBAL // world
    lrs = jnp.full((PN,), lr, jnp.float32)
    losses = []
    for t0 in range(0, n_steps, PN):
        per_rank = np.stack(
            [
                np.stack(
                    [
                        ids[t].reshape(F, B_GLOBAL, POOL)[
                            :, r * B_local : (r + 1) * B_local
                        ].reshape(-1)
                        for r in range(world)
                    ]
                )
                for t in range(t0, t0 + PN)
            ]
        )  # (P, W, L)
        enc = sharded.prepare_ids_per_rank(
            per_rank.transpose(1, 0, 2).reshape(world, -1)
        )
        enc = enc.reshape(world, PN, -1).transpose(1, 0, 2)
        cache = sharded.global_cache()
        d = dense[t0 : t0 + PN].reshape(PN, world, B_local, DIN)
        l = labels[t0 : t0 + PN].reshape(PN, world, B_local)
        dp, cache, loss_w = wstep(
            dp, cache, jnp.asarray(enc), jnp.asarray(d), jnp.asarray(l),
            lrs, lrs,
        )
        sharded.sync_shards(cache)
        losses += [float(x) for x in np.asarray(loss_w)]
    ref_losses, ref_w = _single_host_losses(
        ids, dense, labels, w0, lr, n_steps, cap_total=cap_shard * world
    )
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        sharded.dense_weight(), ref_w, rtol=1e-4, atol=1e-5
    )


def test_rowwise_eval_probs():
    world = 2
    mesh = make_mesh(world)
    ids, dense, labels = _stream(2, seed=21)
    w0 = _init_weight(seed=22)
    sharded = RowShardedCachedEmbeddingBag(
        N, D, mesh=mesh, cuda_row_num=128, initial_weight=w0, buffer_size=0,
    )
    estep = build_rowwise_cached_step(
        mesh, num_features=F, global_batch=B_GLOBAL, pooling=POOL,
        capacity=128, model="dlrm", train=False,
    )
    key = jax.random.PRNGKey(0)
    dp = init_dlrm_dense(key, D, F, DIN, (16, D), (16, 8, 1))
    B_local = B_GLOBAL // world
    fb = ids[0].reshape(F, B_GLOBAL, POOL)
    per_rank = np.stack(
        [fb[:, r * B_local : (r + 1) * B_local].reshape(-1) for r in range(world)]
    )
    enc = sharded.prepare_ids_per_rank(per_rank)
    cache = sharded.global_cache()
    lrj = jnp.asarray(0.0, jnp.float32)
    probs = estep(
        dp, cache, jnp.asarray(enc),
        jnp.asarray(dense[0].reshape(world, B_local, DIN)), lrj, lrj,
    )
    p = np.asarray(probs).reshape(-1)
    assert p.shape == (B_GLOBAL,)
    assert np.all((p >= 0) & (p <= 1))
