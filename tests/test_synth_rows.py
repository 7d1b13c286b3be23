"""Lazy device-init: the canonical procedural row generator must agree across
its three implementations (C++ host, numpy fallback, device jnp), and the
cache must stay value-consistent when never-trained rows are synthesized on
device instead of fetched from the host table."""

import numpy as np
import jax.numpy as jnp
import pytest

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.cache.host_table import DenseHostTable, VirtualHostTable
from cachedembedding_tpu.cache.manager import CachedEmbeddingBag
from cachedembedding_tpu.ops.synth_rows import synth_rows


def test_generator_parity_numpy_vs_device():
    rows = np.array([0, 1, 7, 123456, 2**30], np.int64)
    bounds = np.array([0.5, 0.1, 0.25, 1.0, 0.01], np.float32)
    ref = hostops.gen_rows_canonical(rows, seed=42, bounds=bounds, dim=16)
    dev = np.asarray(
        synth_rows(jnp.asarray(rows, jnp.int32), jnp.asarray(bounds), jnp.uint32(42), 16)
    )
    np.testing.assert_allclose(dev, ref, rtol=1e-6, atol=1e-8)
    assert np.abs(ref).max() <= bounds.max()
    # distribution sanity: not degenerate
    assert ref.std() > 0.01


@pytest.mark.skipif(not hostops.native_available(), reason="native lib not built")
def test_generator_parity_cpp():
    buf = np.empty((100, 8), np.float32)
    hostops.fill_rows_canonical(buf, start_row=50, seed=7, bound=0.3)
    rows = np.arange(50, 150, dtype=np.int64)
    ref = hostops.gen_rows_canonical(rows, seed=7, bounds=np.full(100, 0.3, np.float32), dim=8)
    # gcc may contract (h>>8)*scale - bound into an FMA: 1-ulp-level wiggle is
    # fine — these are random init values.
    np.testing.assert_allclose(buf, ref, rtol=1e-6, atol=5e-8)


@pytest.mark.skipif(not hostops.native_available(), reason="native lib not built")
def test_virtual_table_uses_canonical_generator():
    vt = VirtualHostTable([64, 64], dim=8, seed=11)
    ids = np.array([0, 63, 64, 127], np.int64)
    got = vt.gather(ids)
    ref = hostops.gen_rows_canonical(ids, seed=11, bounds=vt.row_bounds(ids), dim=8)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)
    # written rows override the generator
    vt.scatter(np.array([64], np.int64), np.full((1, 8), 5.0, np.float32))
    assert vt.written_mask(ids).tolist() == [False, False, True, False]
    np.testing.assert_allclose(vt.gather(np.array([64], np.int64)), 5.0)


def test_dense_table_written_tracking():
    arr = np.zeros((32, 4), np.float32)
    hostops.fill_rows_canonical(arr, 0, seed=3, bound=0.5)
    ht = DenseHostTable(arr, procedural_seed=3, table_sizes=[32])
    assert ht.supports_device_init
    assert not ht.written_mask(np.array([1, 2])).any()
    ht.scatter(np.array([2], np.int64), np.ones((1, 4), np.float32))
    assert ht.written_mask(np.array([1, 2])).tolist() == [False, True]


class TestCacheWithDeviceInit:
    def make_bag(self, **kw):
        return CachedEmbeddingBag(
            200, 8, cuda_row_num=32, weight_init="uniform", seed=5,
            table_sizes=[120, 80], buffer_size=0, warmup_ratio=0.0, **kw,
        )

    def test_fresh_lookup_matches_host(self):
        bag = self.make_bag()
        if not bag.device_init:
            pytest.skip("host planner unavailable")
        ids = np.array([3, 150, 7, 199], np.int32)
        slots = bag.prepare_ids(ids)
        got = np.asarray(bag.cache_weight)[np.asarray(slots)]
        ref = bag.host_table.gather(ids.astype(np.int64))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)
        assert bag.stats.synth_rows == 4
        assert bag.stats.swap_in_bytes == 0  # no link bytes for fresh rows

    def test_trained_rows_fetch_from_host_after_eviction(self):
        bag = self.make_bag()
        if not bag.device_init:
            pytest.skip("host planner unavailable")
        rng = np.random.default_rng(0)
        mirror = bag.host_table.gather(np.arange(200, dtype=np.int64)).copy()
        for step in range(25):
            ids = rng.integers(0, 200, 12).astype(np.int32)
            slots = np.asarray(bag.prepare_ids(ids))
            np.testing.assert_allclose(
                np.asarray(bag.cache_weight)[slots], mirror[ids],
                rtol=1e-6, atol=1e-7, err_msg=f"step {step}",
            )
            # fake sgd on distinct rows
            uniq, first = np.unique(ids, return_index=True)
            cw = np.asarray(bag.cache_weight).copy()
            cw[slots[first]] += 1.0 + step
            mirror[uniq] += 1.0 + step
            bag.set_param(jnp.asarray(cw))
        bag.flush()
        got = bag.host_table.gather(np.arange(200, dtype=np.int64))
        np.testing.assert_allclose(got, mirror, rtol=1e-6, atol=1e-7)

    def test_warmup_synthesizes_on_device(self):
        freq = np.arange(200, dtype=np.int64)
        bag = CachedEmbeddingBag(
            200, 8, cuda_row_num=32, weight_init="uniform", seed=5,
            table_sizes=[120, 80], buffer_size=0, warmup_ratio=1.0,
            ids_freq_mapping=freq,
        )
        if not bag.device_init:
            pytest.skip("host planner unavailable")
        assert bag.stats.synth_rows == 32
        assert bag.stats.swap_in_bytes == 0
        ids = np.array([199, 198], np.int32)
        slots = bag.prepare_ids(ids)
        got = np.asarray(bag.cache_weight)[np.asarray(slots)]
        np.testing.assert_allclose(
            got, bag.host_table.gather(ids.astype(np.int64)), rtol=1e-6, atol=1e-8
        )
