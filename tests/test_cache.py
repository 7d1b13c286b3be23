"""Cache-semantics unit + property tests (SURVEY.md §4: hit/miss/evict/writeback,
warmup determinism, and the master property: cached lookup ≡ dense lookup for any
id stream)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cachedembedding_tpu.cache.manager import CachedEmbeddingBag
from cachedembedding_tpu.cache.state import EvictionStrategy, init_cache_state, plan_ids
from cachedembedding_tpu.jagged import RaggedFeatures

# Every test in this module runs under all three planners: the jitted device
# state machine, the native C++ host directory, and the numpy fallback
# directory (identical required semantics — see cache/host_directory.py).
PLANNER = "device"


@pytest.fixture(autouse=True, params=["device", "host", "pyhost"])
def _planner(request, monkeypatch):
    global PLANNER
    if request.param == "pyhost":
        import cachedembedding_tpu.cache.host_directory as hd

        monkeypatch.setattr(hd.hostops, "native_available", lambda: False)
        PLANNER = "host"
    else:
        PLANNER = request.param
    yield
    PLANNER = "device"


def make_bag(N=64, D=8, C=16, strategy=EvictionStrategy.LFU, freq=None, warmup=0.0, **kw):
    w = np.arange(N * D, dtype=np.float32).reshape(N, D)
    return CachedEmbeddingBag(
        N, D,
        cuda_row_num=C,
        initial_weight=w,
        evict_strategy=strategy,
        ids_freq_mapping=freq,
        warmup_ratio=warmup,
        buffer_size=0,
        planner=PLANNER,
        **kw,
    )


def resident_set(bag):
    """Rows currently resident in the cache, planner-agnostic."""
    if bag._dir is not None:
        return set(bag._dir.resident()[1].tolist())
    return {r for r in np.asarray(bag.state.slot_to_row).tolist() if r >= 0}


def lookup_rows(bag, ids):
    slots = bag.prepare_ids(np.asarray(ids, np.int32))
    return np.asarray(bag.cache_weight)[np.asarray(slots)]


class TestPrepareIds:
    def test_miss_then_hit(self):
        bag = make_bag()
        ids = np.array([3, 7, 3], np.int32)
        out = lookup_rows(bag, ids)
        np.testing.assert_allclose(out, bag.host_weight[ids])
        assert bag.stats.num_miss_history == [2]
        assert bag.stats.num_hits_history == [0]
        # second call: all hits
        out = lookup_rows(bag, ids)
        np.testing.assert_allclose(out, bag.host_weight[ids])
        assert bag.stats.num_miss_history == [2, 0]
        assert bag.stats.num_hits_history == [0, 2]

    def test_eviction_when_full(self):
        bag = make_bag(N=64, C=4)
        lookup_rows(bag, [0, 1, 2, 3])         # fill
        out = lookup_rows(bag, [10, 11])       # evict two
        np.testing.assert_allclose(out, bag.host_weight[[10, 11]])
        s2r = resident_set(bag)
        assert {10, 11} <= s2r
        assert len(s2r) == 4

    def test_lfu_evicts_least_frequent(self):
        bag = make_bag(N=64, C=4, strategy=EvictionStrategy.LFU)
        lookup_rows(bag, [0, 0, 0, 1, 1, 2, 2, 3])  # freqs: 0->3, 1->2, 2->2, 3->1
        lookup_rows(bag, [9])                        # must evict row 3 (freq 1)
        resident = resident_set(bag)
        assert 3 not in resident
        assert {0, 1, 2, 9} == resident

    def test_dataset_evicts_lowest_dataset_freq(self):
        freq = np.zeros(64, np.int64)
        freq[[0, 1, 2, 3]] = [100, 50, 10, 1]
        freq[9] = 5
        bag = make_bag(N=64, C=4, strategy=EvictionStrategy.DATASET, freq=freq)
        lookup_rows(bag, [0, 1, 2, 3])
        lookup_rows(bag, [9])  # evicts row 3 (dataset freq 1 < others)
        assert resident_set(bag) == {0, 1, 2, 9}

    def test_protected_rows_not_evicted(self):
        bag = make_bag(N=64, C=4)
        lookup_rows(bag, [0, 1, 2, 3])
        # all four needed again plus... capacity exactly covers the working set
        out = lookup_rows(bag, [0, 1, 2, 3])
        np.testing.assert_allclose(out, bag.host_weight[[0, 1, 2, 3]])

    def test_capacity_exhaustion_raises(self):
        bag = make_bag(N=64, C=4)
        with pytest.raises(RuntimeError, match="capacity"):
            bag.prepare_ids(np.arange(5, dtype=np.int32))

    def test_writeback_on_eviction(self):
        bag = make_bag(N=64, C=4, D=8)
        slots = bag.prepare_ids(np.array([5], np.int32))
        # mutate the cached row on device (simulating a grad step)
        cw = np.asarray(bag.cache_weight).copy()
        cw[int(np.asarray(slots)[0])] = 42.0
        bag.set_param(jnp.asarray(cw))
        # force eviction of row 5 by filling with 4 hotter rows
        lookup_rows(bag, [1, 1, 2, 2, 3, 3, 4, 4])
        assert 5 not in resident_set(bag)
        # writeback is deferred; it must land by the next drain point (flush or
        # the next prepare_ids)
        bag.flush()
        np.testing.assert_allclose(bag.host_weight[5], 42.0)

    def test_flush_writes_all_resident(self):
        bag = make_bag(N=64, C=4)
        slots = bag.prepare_ids(np.array([7, 8], np.int32))
        cw = np.asarray(bag.cache_weight).copy()
        sl = np.asarray(slots)
        cw[sl[0]] = 1.5
        cw[sl[1]] = 2.5
        bag.set_param(jnp.asarray(cw))
        bag.flush()
        np.testing.assert_allclose(bag.host_weight[7], 1.5)
        np.testing.assert_allclose(bag.host_weight[8], 2.5)


class TestWarmup:
    def test_warmup_preloads_hottest(self):
        freq = np.zeros(64, np.int64)
        freq[[10, 20, 30, 40]] = [9, 8, 7, 6]
        bag = make_bag(N=64, C=4, strategy=EvictionStrategy.DATASET, freq=freq, warmup=1.0)
        assert resident_set(bag) == {10, 20, 30, 40}
        # hits on warm rows, no swaps
        out = lookup_rows(bag, [10, 20])
        np.testing.assert_allclose(out, bag.host_weight[[10, 20]])
        assert bag.stats.num_miss_history[-1] == 0

    def test_warmup_ratio_partial(self):
        freq = np.arange(64, dtype=np.int64)
        bag = make_bag(N=64, C=8, strategy=EvictionStrategy.DATASET, freq=freq, warmup=0.5)
        resident = resident_set(bag)
        assert len(resident) == 4
        assert resident == {60, 61, 62, 63}


class TestProperty:
    """Master property: cached lookup == host-table lookup for arbitrary skewed id
    streams under eviction pressure, including interleaved updates."""

    @pytest.mark.parametrize("strategy", [EvictionStrategy.LFU, EvictionStrategy.DATASET])
    def test_lookup_equivalence_under_pressure(self, strategy):
        rng = np.random.default_rng(42)
        N, D, C = 500, 4, 32
        freq = rng.integers(0, 100, N).astype(np.int64)
        bag = make_bag(N=N, D=D, C=C, strategy=strategy, freq=freq, warmup=0.5)
        host_copy = bag.host_weight.copy()
        for step in range(20):
            L = int(rng.integers(1, C))
            ids = (rng.zipf(1.5, size=L) % N).astype(np.int32)
            out = lookup_rows(bag, ids)
            np.testing.assert_allclose(out, host_copy[ids], err_msg=f"step {step}")

    def test_updates_survive_eviction_roundtrip(self):
        rng = np.random.default_rng(7)
        N, D, C = 200, 4, 16
        bag = make_bag(N=N, D=D, C=C)
        # mirror of what the "true" table should be
        mirror = bag.host_weight.copy()
        for step in range(30):
            L = int(rng.integers(1, C // 2))
            ids = rng.integers(0, N, L).astype(np.int32)
            slots = np.asarray(bag.prepare_ids(ids))
            # check lookup
            np.testing.assert_allclose(
                np.asarray(bag.cache_weight)[slots], mirror[ids], err_msg=f"step {step}"
            )
            # fake sgd: add step+1 to each distinct touched row once
            uniq_ids, first_pos = np.unique(ids, return_index=True)
            cw = np.asarray(bag.cache_weight).copy()
            cw[slots[first_pos]] += step + 1.0
            mirror[uniq_ids] += step + 1.0
            bag.set_param(jnp.asarray(cw))
        bag.flush()
        np.testing.assert_allclose(bag.host_weight, mirror)


class TestForwardAPI:
    def test_forward_pooling_matches_dense(self):
        N, D = 100, 8
        bag = make_bag(N=N, D=D, C=32)
        B, F = 4, 3
        rng = np.random.default_rng(0)
        ids = rng.integers(0, N, (B, F)).astype(np.int32)
        # feature-major flat values with implicit P=1 offsets
        vals = ids.T.reshape(-1)
        out = bag.forward(vals, num_features=F, batch_size=B)
        assert out.shape == (B, F, D)
        np.testing.assert_allclose(np.asarray(out), bag.host_weight[ids])

    def test_forward_ragged_offsets_sum(self):
        N, D = 50, 4
        bag = make_bag(N=N, D=D, C=32)
        values = np.array([1, 2, 3, 4, 5], np.int32)
        offsets = np.array([0, 2, 2, 5], np.int32)  # bags: {1,2}, {}, {3,4,5}
        out = bag.forward(values, offsets, num_features=1, batch_size=3)
        expect = np.stack([
            bag.host_weight[1] + bag.host_weight[2],
            np.zeros(D, np.float32),
            bag.host_weight[3] + bag.host_weight[4] + bag.host_weight[5],
        ])[None].transpose(1, 0, 2).reshape(3, 1, D)
        np.testing.assert_allclose(np.asarray(out), expect)

    def test_set_cache_op_false_uses_slot_ids(self):
        bag = make_bag(N=100, D=8, C=32)
        ids = np.array([11, 12, 13], np.int32)
        slots = bag.prepare_ids(ids)
        bag.set_cache_op(False)
        out = bag.forward(np.asarray(slots), num_features=3, batch_size=1)
        np.testing.assert_allclose(np.asarray(out).reshape(3, 8), bag.host_weight[ids])


def test_per_sample_weights_sum():
    """EmbeddingBag per_sample_weights semantics (reference forward surface,
    /root/reference/benchmark/benchmark_fbgemm_uvm.py:148)."""
    bag = make_bag(N=50, D=4, C=32)
    values = np.array([1, 2, 3], np.int32)
    offsets = np.array([0, 2, 3], np.int32)
    w = np.array([0.5, 2.0, 3.0], np.float32)
    out = bag.forward(values, offsets, per_sample_weights=w,
                      num_features=1, batch_size=2)
    expect = np.stack([
        0.5 * bag.host_weight[1] + 2.0 * bag.host_weight[2],
        3.0 * bag.host_weight[3],
    ]).reshape(2, 1, 4)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_int8_transfer_quant_roundtrip():
    """Device q8 gather <-> host dequant and host q8 <-> device dequant agree
    within the symmetric-int8 error bound (absmax/254 per element)."""
    import jax.numpy as jnp

    from cachedembedding_tpu.cache.manager import _quant_rows_host
    from cachedembedding_tpu.cache.state import gather_slots_q8, scatter_admits_q8

    rng = np.random.default_rng(0)
    rows = (rng.normal(size=(64, 16)) * 0.3).astype(np.float32)
    # host-side quantize -> device dequant scatter
    q, scales = _quant_rows_host(rows)
    cw = scatter_admits_q8(
        jnp.zeros((64, 16), jnp.float32),
        jnp.arange(64, dtype=jnp.int32), jnp.asarray(q), jnp.asarray(scales),
    )
    bound = (np.abs(rows).max(axis=1) / 254.0 + 1e-8)[:, None]
    assert (np.abs(np.asarray(cw) - rows) <= bound + 1e-6).all()
    # device-side quantize gather -> host dequant
    qd, sd = gather_slots_q8(jnp.asarray(rows), jnp.arange(64, dtype=jnp.int32))
    back = np.asarray(qd).astype(np.float32) * np.asarray(sd)[:, None]
    assert (np.abs(back - rows) <= bound + 1e-6).all()


def test_q4_roundtrip_and_scatter():
    """int4 admit payloads: host quantize -> device dequant lands rows within
    the 4-bit error bound (absmax/14 per element)."""
    import jax.numpy as jnp

    from cachedembedding_tpu.cache.manager import _quant_rows_host4
    from cachedembedding_tpu.cache.state import scatter_admits_q4

    rng = np.random.default_rng(5)
    rows = (rng.standard_normal((64, 16)) * rng.uniform(0.01, 3, (64, 1))).astype(
        np.float32
    )
    rows[7] = 0.0  # all-zero row: scale guard
    packed, scales = _quant_rows_host4(rows)
    assert packed.shape == (64, 8) and packed.dtype == np.uint8
    cw = scatter_admits_q4(
        jnp.zeros((64, 16), jnp.float32),
        jnp.arange(64, dtype=jnp.int32), jnp.asarray(packed), jnp.asarray(scales),
    )
    bound = (np.abs(rows).max(axis=1) / 14.0 + 1e-8)[:, None]
    assert (np.abs(np.asarray(cw) - rows) <= bound + 1e-6).all()


def test_int8_transfer_trains_with_evictions():
    """transfer_dtype=int8/int4 cut swap wire 4x/8x; training through eviction/
    re-admission cycles must retain the AUROC lift of the f32 transfer path."""
    from cachedembedding_tpu.config import CacheConfig, DLRMConfig
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = [1000, 2000, 500, 300]
    aurocs = {}
    for mode in ("float32", "int8", "int4"):
        cfg = DLRMConfig(
            num_embeddings_per_feature=tables,
            embedding_dim=16,
            dense_in_features=4,
            dense_arch_layer_sizes=(32, 16),
            over_arch_layer_sizes=(32, 16, 1),
            batch_size=256,
            learning_rate=0.3,
            cache=CacheConfig(
                cache_ratio=0.25,  # small cache: constant eviction churn
                warmup_ratio=0.7, buffer_size=0, prefetch_num=2,
                transfer_dtype=mode,
            ),
        )
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=30, dense_in_features=4, seed=3
        )
        eval_data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=5, dense_in_features=4, seed=99
        )
        trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
        rep = trainer.train(data, num_iters=30)
        assert np.isfinite(rep.losses).all()
        aurocs[mode] = trainer.evaluate(eval_data)["auroc"]
        # churn actually happened (re-admission fetches carried quantized payloads)
        assert trainer.embed.stats.swap_in_bytes > 0
    assert aurocs["int8"] > aurocs["float32"] - 0.01, aurocs
    assert aurocs["int4"] > aurocs["float32"] - 0.01, aurocs


def test_fp8_cache_rows_retain_auroc():
    """cache_dtype=float8_e4m3fn halves cache HBM again (vs bf16): training
    through eviction churn must retain the bf16 path's AUROC. Storage-only
    fp8 — pooling/update arithmetic stays f32 with one rounding per step."""
    from cachedembedding_tpu.config import CacheConfig, DLRMConfig
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = [1000, 2000, 500, 300]
    aurocs = {}
    for cd in ("bfloat16", "float8_e4m3fn"):
        cfg = DLRMConfig(
            num_embeddings_per_feature=tables,
            embedding_dim=16,
            dense_in_features=4,
            dense_arch_layer_sizes=(32, 16),
            over_arch_layer_sizes=(32, 16, 1),
            batch_size=256,
            learning_rate=0.3,
            cache=CacheConfig(
                cache_ratio=0.25, warmup_ratio=0.7, buffer_size=0,
                prefetch_num=2, cache_dtype=cd,
            ),
        )
        data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=30, dense_in_features=4, seed=3
        )
        eval_data = SyntheticLongTailDataset(
            tables, cfg.batch_size, num_batches=5, dense_in_features=4, seed=99
        )
        trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
        rep = trainer.train(data, num_iters=30)
        assert np.isfinite(rep.losses).all()
        assert trainer.embed.cache_weight.dtype == np.dtype(cd)
        aurocs[cd] = trainer.evaluate(eval_data)["auroc"]
        assert trainer.embed.stats.swap_in_bytes > 0  # churn happened
    assert aurocs["float8_e4m3fn"] > aurocs["bfloat16"] - 0.01, aurocs
