"""Sharding planner + row-wise sharded lookup (torchrec planner/DMP analogs,
/root/reference/baselines/dlrm_main.py:709-792)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cachedembedding_tpu.parallel.mesh import make_mesh
from cachedembedding_tpu.parallel.planner import (
    EmbeddingShardingPlanner,
    Kernel,
    Plan,
    ShardingType,
    TableSpec,
    Topology,
    specs_from_sizes,
)
from cachedembedding_tpu.parallel.row import make_rowwise_embedding_fn, row_shard_bounds


GIB = 1 << 30


def test_small_tables_replicate_big_tables_cache():
    topo = Topology(num_devices=4, hbm_bytes_per_device=16 * GIB)
    specs = [
        TableSpec("tiny", 1000, 128),
        TableSpec("mid", 5_000_000, 128),
        TableSpec("huge", 400_000_000, 128),  # 102 GB bf16: cannot be resident
    ]
    plan = EmbeddingShardingPlanner(topo).plan(specs, batch_size=1024)
    by = {tp.spec.name: tp for tp in plan.tables}
    assert by["tiny"].sharding is ShardingType.REPLICATED
    assert by["huge"].kernel is Kernel.CACHED
    assert by["huge"].host_bytes > 100 * GIB  # f32 master on host
    assert plan.hbm_per_device().max() <= topo.hbm_budget
    assert "cached" in plan.pretty()


def test_planner_balances_table_wise():
    topo = Topology(num_devices=4)
    specs = [TableSpec(f"t{i}", 2_000_000, 128) for i in range(8)]
    plan = EmbeddingShardingPlanner(topo).plan(
        specs, batch_size=1024, force_sharding=ShardingType.TABLE_WISE
    )
    per_dev = plan.hbm_per_device()
    assert per_dev.max() <= 2 * per_dev.min() + specs[0].bytes
    owners = [tp.devices[0] for tp in plan.tables]
    assert len(set(owners)) == 4  # every device owns something


def test_planner_hierarchical_host_group_placements():
    """table_row_wise / table_column_wise (reference sharding types tablerow/
    tablecolumn, baselines/dlrm_main.py:709-721): shards confined to the
    devices of ONE host group, least-loaded group chosen, HBM split by the
    group size."""
    topo = Topology(
        num_devices=8, hbm_bytes_per_device=16 * GIB, devices_per_host=4
    )
    spec = TableSpec("t", 40_000_000, 128)  # 10.2 GB bf16
    for st in (ShardingType.TABLE_ROW_WISE, ShardingType.TABLE_COLUMN_WISE):
        plan = EmbeddingShardingPlanner(topo).plan(
            [spec], batch_size=1024, force_sharding=st
        )
        tp = plan.tables[0]
        assert tp.sharding is st
        assert len(tp.devices) == 4  # one host group, not the fleet
        assert max(tp.devices) - min(tp.devices) == 3  # contiguous group
        assert tp.hbm_bytes_per_device == (spec.bytes + 3) // 4
    # two big tables force-placed hierarchically land on DIFFERENT groups
    plan = EmbeddingShardingPlanner(topo).plan(
        [TableSpec("a", 40_000_000, 128), TableSpec("b", 40_000_000, 128)],
        batch_size=1024, force_sharding=ShardingType.TABLE_ROW_WISE,
    )
    groups = {min(tp.devices) // 4 for tp in plan.tables}
    assert groups == {0, 1}


def test_planner_auto_prefers_host_group_on_multihost():
    """auto mode on a multi-host topology: a table too big for table-wise but
    fitting one host group shards hierarchically (collective off DCN), and
    over-budget hierarchical tables demote to CACHED keeping their group."""
    topo = Topology(
        num_devices=8, hbm_bytes_per_device=16 * GIB, devices_per_host=4,
        host_dram_bytes=512 * GIB,  # the huge table's f32 master is 381 GiB
    )
    specs = [
        TableSpec("grp", 40_000_000, 128),      # > budget/4, fits a group
        TableSpec("huge", 800_000_000, 128),    # 204 GB: must cache
    ]
    plan = EmbeddingShardingPlanner(topo).plan(specs, batch_size=1024)
    by = {tp.spec.name: tp for tp in plan.tables}
    assert by["grp"].sharding is ShardingType.TABLE_COLUMN_WISE  # 128 % 4 == 0
    assert by["huge"].kernel is Kernel.CACHED
    assert plan.hbm_per_device().max() <= topo.hbm_budget


def test_planner_raises_when_impossible():
    topo = Topology(num_devices=1, hbm_bytes_per_device=1 * GIB, host_dram_bytes=1 * GIB)
    specs = [TableSpec("huge", 1_000_000_000, 128)]
    with pytest.raises(ValueError):
        EmbeddingShardingPlanner(topo).plan(specs, batch_size=1024)


def test_specs_from_sizes_hot_fraction():
    sizes = [100, 50]
    freq = np.concatenate([
        np.r_[np.full(5, 1000), np.ones(95)],  # 5 hot ids dominate
        np.ones(50),
    ]).astype(np.int64)
    specs = specs_from_sizes(sizes, 16, id_freq_map=freq)
    assert specs[0].hot_fraction < 0.3
    assert specs[1].hot_fraction > 0.9


def test_rowwise_lookup_matches_dense(cpu_devices):
    mesh = make_mesh(8)
    N, D, L = 1000, 16, 333
    rng = np.random.default_rng(0)
    w = rng.normal(size=(N, D)).astype(np.float32)
    ids = rng.integers(0, N, L).astype(np.int32)
    lookup, shard_weight = make_rowwise_embedding_fn(mesh, N)
    w_sharded = shard_weight(w)
    out = jax.jit(lookup)(w_sharded, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), w[ids], rtol=1e-6)


def test_rowwise_grads_land_on_owner_shards(cpu_devices):
    mesh = make_mesh(8)
    N, D, L = 64, 4, 40
    rng = np.random.default_rng(1)
    w = rng.normal(size=(N, D)).astype(np.float32)
    ids = rng.integers(0, N, L).astype(np.int32)
    lookup, shard_weight = make_rowwise_embedding_fn(mesh, N)
    w_sharded = shard_weight(w)

    def loss(ws):
        return lookup(ws, jnp.asarray(ids)).sum()

    g = jax.jit(jax.grad(loss))(w_sharded)
    g_np = np.asarray(g)[:N]
    expect = np.zeros((N, D), np.float32)
    np.add.at(expect, ids, 1.0)
    np.testing.assert_allclose(g_np, expect, rtol=1e-6)
    bounds = row_shard_bounds(N, 8)
    assert bounds[-1] >= N and np.asarray(g).shape[0] == bounds[-1]
