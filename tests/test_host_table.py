"""Host table backends: dense gather/scatter and the procedural+overlay
VirtualHostTable (deterministic generation, overlay read-your-writes, growth)."""

import numpy as np
import pytest

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.cache.host_table import DenseHostTable, VirtualHostTable

needs_native = pytest.mark.skipif(
    not hostops.native_available(), reason="native hostops not built"
)


class TestDense:
    def test_gather_scatter_roundtrip(self):
        t = DenseHostTable(np.arange(40, dtype=np.float32).reshape(10, 4))
        out = t.gather(np.array([3, 1]))
        np.testing.assert_array_equal(out, t.array[[3, 1]])
        t.scatter(np.array([0]), np.full((1, 4), 9.0, np.float32))
        assert (t.array[0] == 9).all()


@needs_native
class TestVirtual:
    def test_deterministic_and_bounded(self):
        t = VirtualHostTable([100, 400], 8, seed=5)
        idx = np.array([0, 50, 150, 499])
        a, b = t.gather(idx), t.gather(idx)
        np.testing.assert_array_equal(a, b)
        assert np.abs(a[:2]).max() <= 100 ** -0.5 + 1e-6
        assert np.abs(a[2:]).max() <= 400 ** -0.5 + 1e-6
        # different rows differ
        assert not np.array_equal(a[0], a[1])

    def test_read_your_writes_and_growth(self):
        t = VirtualHostTable([10_000], 4, seed=1, capacity_hint=64)
        rng = np.random.default_rng(0)
        idx = rng.choice(10_000, 500, replace=False)
        vals = rng.random((500, 4)).astype(np.float32)
        t.scatter(idx, vals)  # forces several growths past the 64 hint
        np.testing.assert_array_equal(t.gather(idx), vals)
        assert t.overlay_rows == 500
        # untouched rows still procedural/deterministic
        other = np.setdiff1d(np.arange(10_000), idx)[:10]
        np.testing.assert_array_equal(t.gather(other), t.gather(other))

    def test_cached_bag_on_virtual_table(self):
        from cachedembedding_tpu.cache.manager import CachedEmbeddingBag

        bag = CachedEmbeddingBag(
            1000, 8, cuda_row_num=64, warmup_ratio=0.0, weight_init="virtual",
            buffer_size=0,
        )
        ids = np.array([5, 700, 5, 999], np.int32)
        slots = bag.prepare_ids(ids)
        got = np.asarray(bag.cache_weight)[np.asarray(slots)]
        np.testing.assert_allclose(got, bag.host_table.gather(ids.astype(np.int64)))
        bag.flush()
        assert bag.host_table.overlay_rows >= 3
