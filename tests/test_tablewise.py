"""Tablewise (EP-style) parallelism: placement helpers, id routing, and numeric
equivalence of the tablewise train step with a single-device step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.cache.host_table import DenseHostTable
from cachedembedding_tpu.cache.state import EvictionStrategy
from cachedembedding_tpu.jagged import RaggedFeatures
from cachedembedding_tpu.models.dlrm import init_dlrm_dense
from cachedembedding_tpu.parallel.mesh import AXIS, make_mesh
from cachedembedding_tpu.parallel.tablewise import (
    ParallelCachedEmbeddingBagTablewise,
    TablewiseEmbeddingBagConfig,
    auto_rank_arrange,
    get_tablewise_rank_arrange,
    prepare_tablewise_config,
    tablewise_train_step,
)
from cachedembedding_tpu.train.trainer import _train_step

needs_native = pytest.mark.skipif(
    not hostops.native_available(), reason="native hostops not built"
)


class TestPlacement:
    def test_hand_tuned_maps_parity(self):
        for w in (1, 2, 3, 4, 8):
            arr = get_tablewise_rank_arrange("criteo_kaggle", w)
            assert len(arr) == 26
            assert max(arr) < w
        for w in (1, 2, 4):
            assert len(get_tablewise_rank_arrange("criteo_terabyte", w)) == 26

    def test_auto_balance(self):
        sizes = [100, 100, 100, 1]
        arr = auto_rank_arrange(sizes, 2)
        load = [sum(s for s, r in zip(sizes, arr) if r == q) for q in range(2)]
        assert abs(load[0] - load[1]) <= 100

    def test_prepare_config_clamp(self):
        cfgs = prepare_tablewise_config([10, 100000], 0.01, dataset=None,
                                        world_size=2, rank_arrange=[0, 1])
        assert cfgs[0].cuda_row_num == 10  # clamped to table size
        assert cfgs[1].cuda_row_num == 1000 + 2000


def _make_tablewise(mesh, table_sizes, ranks, D, W_global, cache_full=True):
    cfgs = []
    for n, r in zip(table_sizes, ranks):
        cfgs.append(
            TablewiseEmbeddingBagConfig(
                num_embeddings=n,
                cuda_row_num=n if cache_full else max(2, n // 4),
                assigned_rank=r,
            )
        )
    tw = ParallelCachedEmbeddingBagTablewise(
        cfgs, D, mesh, warmup_ratio=0.0, weight_init="zeros",
        evict_strategy=EvictionStrategy.LFU,
    )
    # install deterministic host weights from the global table
    offs = np.concatenate([[0], np.cumsum(table_sizes)])
    for r in range(tw.world):
        rows = [W_global[offs[t] : offs[t + 1]] for t in tw.tables_of_rank[r]]
        rows.append(np.zeros((1, D), np.float32))  # pad row
        tw.host_tables[r] = DenseHostTable(np.ascontiguousarray(np.concatenate(rows)))
    return tw


@needs_native
class TestTablewiseStep:
    def test_matches_single_device(self, cpu_devices):
        w = 4
        mesh = make_mesh(w)
        table_sizes = [40, 30, 20, 25, 15]
        ranks = [0, 1, 2, 3, 0]
        B, D, Din = 8, 32, 5
        rng = np.random.default_rng(0)
        N = sum(table_sizes)
        W_global = (rng.normal(size=(N, D)) * 0.1).astype(np.float32)
        tw = _make_tablewise(mesh, table_sizes, ranks, D, W_global)

        ids_bf = np.stack(
            [rng.integers(0, n, B) for n in table_sizes], axis=1
        )  # per-feature local ids
        dense = rng.random((B, Din)).astype(np.float32)
        labels = rng.integers(0, 2, B).astype(np.float32)
        params = init_dlrm_dense(jax.random.PRNGKey(0), D, len(table_sizes), Din, (8, D), (8, 4, 1))
        lr = jnp.asarray(0.05, jnp.float32)

        # --- single-device reference on the fused global id space ---
        offs = np.concatenate([[0], np.cumsum(table_sizes)[:-1]])
        gids = (ids_bf + offs[None, :]).astype(np.int32)
        feats = RaggedFeatures.from_dense_ids(jnp.asarray(gids))
        p1, w1, loss1 = _train_step(
            jax.tree_util.tree_map(jnp.copy, params), jnp.asarray(W_global),
            jnp.asarray(dense), feats, jnp.asarray(labels), lr, lr,
        )

        # --- tablewise ---
        slot_ids, plans = tw.begin_prepare(ids_bf)
        tw.finish_prepare(plans)
        step = tablewise_train_step(
            mesh, feature_perm=tw.feature_select_perm(), f_max=tw.F_max,
            global_batch=B,
        )
        dn = jax.device_put(jnp.asarray(dense), NamedSharding(mesh, P(AXIS)))
        lb = jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P(AXIS)))
        p2, new_cache, loss2 = step(
            jax.tree_util.tree_map(jnp.copy, params), tw.cache_weight,
            dn, slot_ids, lb, lr, lr,
        )
        tw.cache_weight = new_cache

        np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
        # flush and compare per-table rows with the single-device updated table
        tw.flush()
        w1_np = np.asarray(w1)
        for t, (n, r) in enumerate(zip(table_sizes, ranks)):
            local_off = tw.table_local_offset[t]
            got = tw.host_tables[r].array[local_off : local_off + n]
            np.testing.assert_allclose(
                got, w1_np[offs[t] : offs[t] + n], rtol=1e-4, atol=1e-6,
                err_msg=f"table {t}",
            )
        for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    def test_cache_pressure_roundtrip(self, cpu_devices):
        w = 2
        mesh = make_mesh(w)
        table_sizes = [50, 60]
        ranks = [0, 1]
        B, D = 6, 16
        rng = np.random.default_rng(3)
        N = sum(table_sizes)
        W_global = (rng.normal(size=(N, D))).astype(np.float32)
        tw = _make_tablewise(mesh, table_sizes, ranks, D, W_global, cache_full=False)
        # several windows of lookups under eviction pressure: values must match
        for step_i in range(5):
            ids_bf = np.stack([rng.integers(0, n, B) for n in table_sizes], axis=1)
            slot_ids, plans = tw.begin_prepare(ids_bf)
            tw.finish_prepare(plans)
            sl = np.asarray(slot_ids)
            cw = np.asarray(tw.cache_weight)
            for t, (n, r) in enumerate(zip(table_sizes, ranks)):
                j = tw.feat_pos[t][1]
                got = cw[r][sl[r, j * B : (j + 1) * B]]
                expect = W_global[np.cumsum([0] + table_sizes)[t] + ids_bf[:, t]]
                np.testing.assert_allclose(got, expect, err_msg=f"step {step_i} t {t}")


@needs_native
def test_tablewise_window_matches_per_batch(cpu_devices):
    """The windowed tablewise scan (one shard_map execute per prefetch window)
    must train identically to P sequential per-batch tablewise steps, and the
    windowed eval must score with the trained weights."""
    from cachedembedding_tpu.parallel.tablewise import (
        tablewise_eval_step,
        tablewise_window_step,
    )

    w, B, D, Din, Pn = 4, 8, 32, 5, 3
    mesh = make_mesh(w)
    table_sizes = [40, 30, 20, 25, 15]
    ranks = [0, 1, 2, 3, 0]
    rng = np.random.default_rng(1)
    N = sum(table_sizes)
    W_global = (rng.normal(size=(N, D)) * 0.1).astype(np.float32)
    params = init_dlrm_dense(
        jax.random.PRNGKey(0), D, len(table_sizes), Din, (8, D), (8, 4, 1)
    )
    lr = 0.05
    batches = []
    for _ in range(Pn):
        ids_bf = np.stack([rng.integers(0, n, B) for n in table_sizes], axis=1)
        dense = rng.random((B, Din)).astype(np.float32)
        labels = rng.integers(0, 2, B).astype(np.float32)
        batches.append((ids_bf, dense, labels))

    # --- per-batch path ---
    tw1 = _make_tablewise(mesh, table_sizes, ranks, D, W_global)
    step1 = tablewise_train_step(
        mesh, feature_perm=tw1.feature_select_perm(), f_max=tw1.F_max,
        global_batch=B,
    )
    p1 = jax.tree_util.tree_map(jnp.copy, params)
    losses1 = []
    for ids_bf, dense, labels in batches:
        slot_ids, plans = tw1.begin_prepare(ids_bf)
        tw1.finish_prepare(plans)
        dn = jax.device_put(jnp.asarray(dense), NamedSharding(mesh, P(AXIS)))
        lb = jax.device_put(jnp.asarray(labels), NamedSharding(mesh, P(AXIS)))
        p1, tw1.cache_weight, loss = step1(
            p1, tw1.cache_weight, dn, slot_ids, lb,
            jnp.asarray(lr, jnp.float32), jnp.asarray(lr, jnp.float32),
        )
        losses1.append(float(loss))

    # --- windowed path ---
    tw2 = _make_tablewise(mesh, table_sizes, ranks, D, W_global)
    slot_ids_w, plans = tw2.begin_prepare_window([b[0] for b in batches])
    tw2.finish_prepare(plans)
    stepw = tablewise_window_step(
        mesh, feature_perm=tw2.feature_select_perm(), f_max=tw2.F_max,
        global_batch=B,
    )
    dense_P = jax.device_put(
        jnp.asarray(np.stack([b[1] for b in batches])),
        NamedSharding(mesh, P(None, AXIS)),
    )
    labels_P = jax.device_put(
        jnp.asarray(np.stack([b[2] for b in batches])),
        NamedSharding(mesh, P(None, AXIS)),
    )
    lrs = jnp.full((Pn,), lr, jnp.float32)
    p2, tw2.cache_weight, losses2 = stepw(
        jax.tree_util.tree_map(jnp.copy, params), tw2.cache_weight,
        slot_ids_w, dense_P, labels_P, lrs, lrs,
    )
    np.testing.assert_allclose(np.asarray(losses2), losses1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    # windowed eval runs on the trained weights and returns (P, B) probs
    evw = tablewise_eval_step(
        mesh, feature_perm=tw2.feature_select_perm(), f_max=tw2.F_max,
        global_batch=B,
    )
    probs = evw(p2, tw2.cache_weight, slot_ids_w, dense_P)
    assert probs.shape == (Pn, B)
    assert np.isfinite(np.asarray(probs)).all()
