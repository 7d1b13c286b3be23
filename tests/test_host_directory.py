"""HostDirectory (native C++) vs PyDirectory (numpy reference) equivalence.

The directory is the host-authoritative re-implementation of the cache
bookkeeping (SURVEY.md §2.2 ``prepare_ids`` semantics). Exact victim identity
may differ between implementations on LFU ties, so the contract tested here is
semantic: remap correctness, residency invariants, hit/miss accounting, LFU
ordering, and warmup behavior.
"""

import numpy as np
import pytest

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.cache.host_directory import (
    CapacityError,
    HostDirectory,
    PyDirectory,
)
from cachedembedding_tpu.cache.state import EvictionStrategy

needs_native = pytest.mark.skipif(
    not hostops.native_available(), reason="native hostops not built"
)


def check_invariants(d, plan, ids):
    # every id got a valid slot
    assert (plan.slot_ids >= 0).all() and (plan.slot_ids < d.capacity).all()
    # admit slots are distinct
    assert len(np.unique(plan.admit_slots)) == plan.admit_slots.shape[0]
    # the remap is consistent with the directory's own resident map
    slots, rows = d.resident()
    slot_of = {int(r): int(s) for s, r in zip(slots, rows)}
    for i in np.random.default_rng(0).choice(len(ids), min(64, len(ids)), replace=False):
        assert plan.slot_ids[i] == slot_of[int(ids[i])]
    # evicted rows are really gone
    for r in plan.evict_rows[plan.evict_rows >= 0]:
        assert d.lookup(int(r)) == -1


@needs_native
class TestNativeDirectory:
    def test_fuzz_vs_python(self):
        rng = np.random.default_rng(3)
        N, C = 5000, 256
        freq = rng.integers(0, 1000, N).astype(np.int64)
        hd = HostDirectory(N, C, EvictionStrategy.LFU)
        pd = PyDirectory(N, C, EvictionStrategy.LFU)
        top = np.argsort(freq)[-100:].astype(np.int64)
        hd.warmup(top, freq[top])
        pd.warmup(top, freq[top])
        h_hits = p_hits = h_uniq = p_uniq = 0
        for step in range(40):
            L = int(rng.integers(10, 200))
            ids = (rng.zipf(1.4, L) % N).astype(np.int32)
            hp = hd.plan(ids)
            pp = pd.plan(ids)
            # unique counting is deterministic and must agree exactly
            assert hp.n_unique == pp.n_unique == len(np.unique(ids)), step
            # internal consistency: every unique id is either a hit or admitted
            assert hp.n_hit_unique + hp.admit_rows.shape[0] == hp.n_unique, step
            assert pp.n_hit_unique + pp.admit_rows.shape[0] == pp.n_unique, step
            check_invariants(hd, hp, ids)
            check_invariants(pd, pp, ids)
            h_hits += hp.n_hit_unique
            p_hits += pp.n_hit_unique
            h_uniq += hp.n_unique
            p_uniq += pp.n_unique
        # LFU tie-breaking differs between implementations, so residency (and
        # hence individual hit sets) may drift — but aggregate hit rates must
        # agree closely on the same stream.
        assert abs(h_hits / h_uniq - p_hits / p_uniq) < 0.05, (h_hits, p_hits)

    def test_capacity_error_is_clean(self):
        hd = HostDirectory(100, 4, EvictionStrategy.LFU)
        hd.plan(np.array([1, 2], np.int32))
        with pytest.raises(CapacityError):
            hd.plan(np.arange(5, dtype=np.int32))
        # state not corrupted: prior residents still resident, new plan works
        assert hd.lookup(1) >= 0 and hd.lookup(2) >= 0
        p = hd.plan(np.array([1, 2, 3, 4], np.int32))
        check_invariants(hd, p, np.array([1, 2, 3, 4], np.int32))

    def test_lfu_occurrence_counting(self):
        hd = HostDirectory(100, 4, EvictionStrategy.LFU)
        # counts within one window seed the priorities
        hd.plan(np.array([7, 7, 7, 8, 8, 9], np.int32))
        # one free slot remains; admit 10, then force one eviction: 9 (count 1)
        hd.plan(np.array([10], np.int32))
        hd.plan(np.array([11], np.int32))
        assert hd.lookup(9) == -1
        assert hd.lookup(7) >= 0 and hd.lookup(8) >= 0

    def test_dataset_strategy_uses_static_freq(self):
        N = 50
        freq = np.zeros(N, np.int64)
        freq[[1, 2, 3, 4]] = [100, 50, 10, 1]
        hd = HostDirectory(N, 4, EvictionStrategy.DATASET)
        hd.set_dataset_freq(freq)
        hd.plan(np.array([1, 2, 3, 4], np.int32))
        hd.plan(np.array([20], np.int32))  # evicts 4 (dataset freq 1)
        assert hd.lookup(4) == -1
        assert hd.lookup(1) >= 0

    def test_large_stream_counts(self):
        """Occurrence counts saturate, uniques exact, on a multi-M id stream."""
        rng = np.random.default_rng(0)
        N, C = 1 << 20, 1 << 14
        hd = HostDirectory(N, C, EvictionStrategy.LFU)
        ids = (rng.zipf(1.5, 1 << 20) % N).astype(np.int32)
        p = hd.plan(ids)
        assert p.n_unique == len(np.unique(ids))
        assert p.n_hit_weighted == 0  # cold cache: no hits
        assert p.admit_rows.shape[0] == min(p.n_unique, C)
