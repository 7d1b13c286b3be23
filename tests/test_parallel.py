"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the hybrid
(model-parallel embedding x data-parallel dense) step must be numerically
identical to the single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cachedembedding_tpu.jagged import RaggedFeatures
from cachedembedding_tpu.models.dlrm import init_dlrm_dense
from cachedembedding_tpu.parallel.hybrid import hybrid_train_step
from cachedembedding_tpu.parallel.mesh import AXIS, make_mesh
from cachedembedding_tpu.train.trainer import _train_step


def _setup(w, B_global=16, F=3, D=32, Din=5, C=64, seed=0):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = init_dlrm_dense(key, D, F, Din, (8, D), (8, 4, 1))
    cache = rng.normal(size=(C, D)).astype(np.float32) * 0.1
    dense = rng.random((B_global, Din)).astype(np.float32)
    labels = rng.integers(0, 2, B_global).astype(np.float32)
    slot_ids = rng.integers(0, C, (F * B_global,)).astype(np.int32)
    return params, cache, dense, labels, slot_ids


def test_hybrid_matches_single_device(cpu_devices):
    B_global, F, D, C = 16, 3, 32, 64
    params, cache, dense, labels, slot_ids = _setup(8, B_global, F, D, 5, C)
    lr = jnp.asarray(0.05, jnp.float32)

    # single-device reference via the trainer step (dense_lr NOT rescaled here:
    # pass identical lrs so updates match exactly)
    feats = RaggedFeatures(
        values=jnp.asarray(slot_ids), offsets=None,
        num_features=F, batch_size=B_global, pooling=1,
    )
    p1, c1, loss1 = _train_step(
        jax.tree_util.tree_map(jnp.copy, params), jnp.asarray(cache),
        jnp.asarray(dense), feats, jnp.asarray(labels), lr, lr,
    )

    # 8-device hybrid
    mesh = make_mesh(8)
    step = hybrid_train_step(mesh, num_features=F, global_batch=B_global, pooling=1)
    cw = jax.device_put(jnp.asarray(cache), NamedSharding(mesh, P(None, AXIS)))
    dn = jax.device_put(jnp.asarray(dense), NamedSharding(mesh, P(AXIS)))
    lb = jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P(AXIS)))
    p8, c8, loss8 = step(
        jax.tree_util.tree_map(jnp.copy, params), cw, dn, jnp.asarray(slot_ids), lb, lr, lr
    )

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c1), rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p8), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_gather_scatter_fused_op_matches_all_to_all(cpu_devices):
    B_global, F, D, C = 16, 3, 32, 64
    params, cache, dense, labels, slot_ids = _setup(8, B_global, F, D, 5, C)
    lr = jnp.asarray(0.05, jnp.float32)
    mesh = make_mesh(8)
    results = []
    for op in ("all_to_all", "gather_scatter"):
        step = hybrid_train_step(
            mesh, num_features=F, global_batch=B_global, pooling=1, fused_op=op
        )
        cw = jax.device_put(jnp.asarray(cache), NamedSharding(mesh, P(None, AXIS)))
        dn = jax.device_put(jnp.asarray(dense), NamedSharding(mesh, P(AXIS)))
        lb = jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P(AXIS)))
        p, c, loss = step(
            jax.tree_util.tree_map(jnp.copy, params), cw, dn,
            jnp.asarray(slot_ids), lb, lr, lr,
        )
        results.append((float(loss), np.asarray(c)))
    # different comm strategies build different XLA graphs; f32 reassociation
    # gives ~1e-4 jitter, so this checks equivalence not bit-identity
    assert abs(results[0][0] - results[1][0]) < 1e-3
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-3, atol=1e-5)


def test_hybrid_runs_on_subset_mesh(cpu_devices):
    # world=2 and world=4 shapes also compile + run
    for w in (2, 4):
        B_global, F, D, C = 8, 2, 16, 32
        params, cache, dense, labels, slot_ids = _setup(w, B_global, F, D, 5, C, seed=w)
        mesh = make_mesh(w)
        step = hybrid_train_step(mesh, num_features=F, global_batch=B_global, pooling=1)
        cw = jax.device_put(jnp.asarray(cache), NamedSharding(mesh, P(None, AXIS)))
        dn = jax.device_put(jnp.asarray(dense), NamedSharding(mesh, P(AXIS)))
        lb = jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P(AXIS)))
        lr = jnp.asarray(0.1, jnp.float32)
        _, _, loss = step(params, cw, dn, jnp.asarray(slot_ids), lb, lr, lr)
        assert np.isfinite(float(loss))


def test_owner_routed_exchange(cpu_devices):
    """exchange_to_owners must deliver each id to exactly its owner rank with
    O(total/world) per-rank traffic — the >= 2-host wire shape (reference
    lengths-then-values owner exchange, recsys/datasets/utils.py:29-41)."""
    from cachedembedding_tpu.parallel.all_to_all import (
        bucket_by_owner,
        exchange_to_owners,
    )

    w = 8
    mesh = make_mesh(w)
    n_local, V = 32, 16  # per-pair budget V << w * n_local: O(world) shape
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (w, n_local)).astype(np.int32)
    owners = (ids % w).astype(np.int32)  # owner = id % world (tablewise hash)

    def fn(ids_local, owners_local):
        bucketed, counts = bucket_by_owner(ids_local, owners_local, w, V)
        return exchange_to_owners(bucketed, counts)

    mapped = jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS)), check_vma=False,
        )
    )
    recv, counts = mapped(
        jax.device_put(jnp.asarray(ids.reshape(-1)), NamedSharding(mesh, P(AXIS))),
        jax.device_put(jnp.asarray(owners.reshape(-1)), NamedSharding(mesh, P(AXIS))),
    )
    recv = np.asarray(recv).reshape(w, w, V)   # [owner_rank, src_rank, V]
    counts = np.asarray(counts).reshape(w, w)  # [owner_rank, src_rank]
    for own in range(w):
        for src in range(w):
            want = np.sort(ids[src][owners[src] == own])
            got = np.sort(recv[own, src, : counts[own, src]])
            np.testing.assert_array_equal(got, want)
    # wire shape: each rank communicates w*V = 128 ids, NOT w*n_local*w = 2048
    assert recv[0].size // w == V * w // w and V * w < w * n_local * w
