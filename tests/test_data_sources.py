"""New data sources: random, synth trace replay, parquet streaming, dict
transform, prefetch iterator, unified dispatch (reference analogs:
baselines/data/dlrm_dataloader.py, baselines/data/synth.py,
recsys/datasets/utils.py KJTTransform, recsys/utils/dataloader/)."""

import numpy as np
import pytest

from cachedembedding_tpu.data.dispatch import get_dataloader
from cachedembedding_tpu.data.prefetch import FiniteDataIter, PrefetchIterator
from cachedembedding_tpu.data.random_rec import RandomRecDataset
from cachedembedding_tpu.data.synth import (
    SynthTraceDataset,
    choose_tables,
    compact_ids,
)
from cachedembedding_tpu.data.transform import DictBatchTransform


def test_random_dataset_shapes():
    data = RandomRecDataset([100, 50], 8, num_batches=3, dense_in_features=4)
    batches = list(data)
    assert len(batches) == 3
    b = batches[0]
    assert b.dense_features.shape == (8, 4)
    assert b.sparse_features.values.shape == (2 * 8,)
    # global id space: feature 1 ids offset by 100
    f1 = np.asarray(b.sparse_features.values)[8:]
    assert (f1 >= 100).all() and (f1 < 150).all()


def test_synth_trace_replay_ragged():
    rng = np.random.default_rng(0)
    traces = []
    sizes = []
    for t in range(3):
        lengths = rng.integers(0, 5, 16)
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        indices = rng.integers(0, 40, offsets[-1])
        traces.append((indices, offsets))
        sizes.append(40)
    data = SynthTraceDataset(traces, sizes, batch_size=4, num_batches=5, dense_in_features=2)
    for b in data:
        f = b.sparse_features
        assert f.pooling is None and f.offsets is not None
        assert f.offsets[-1] == f.values.shape[0]
        assert f.num_features == 3 and f.batch_size == 4
        vals = np.asarray(f.values)
        assert (vals >= 0).all() and (vals < 120).all()  # fused id space
    freq = data.id_freq_map()
    assert freq.shape == (120,)
    assert freq.sum() == sum(t[0].shape[0] for t in traces)


def test_compact_ids():
    ids = np.array([100, 7, 100, 999, 7])
    compacted, n = compact_ids(ids)
    assert n == 3
    assert compacted.max() == 2
    # same equality structure
    assert compacted[0] == compacted[2] and compacted[1] == compacted[4]


def test_choose_tables():
    assert choose_tables([3_000_000, 2_000_000, 1_000_000], "4M") == [0, 1]


def test_dict_transform():
    cols = {
        "int_0": np.array([1.0, 2.0]),
        "cat_0": np.array([5, 105]),
        "cat_1": np.array([7, 8]),
        "label": np.array([1, 0]),
    }
    tf = DictBatchTransform(["int_0"], ["cat_0", "cat_1"], [100, 50])
    b = tf(cols)
    vals = np.asarray(b.sparse_features.values)
    np.testing.assert_array_equal(vals, [5, 5, 100 + 7, 100 + 8])  # %hash + offset
    assert b.dense_features.shape == (2, 1)


def test_parquet_reader(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(0)
    n = 100
    tbl = pa.table({
        "label": rng.integers(0, 2, n).astype(np.int32),
        "int_0": rng.integers(0, 50, n).astype(np.int32),
        "int_1": rng.integers(0, 50, n).astype(np.int32),
        "cat_0": rng.integers(0, 10_000, n).astype(np.int64),
        "cat_1": rng.integers(0, 10_000, n).astype(np.int64),
    })
    pq.write_table(tbl, tmp_path / "part0.parquet", row_group_size=30)

    from cachedembedding_tpu.data.parquet import ParquetDataReader

    reader = ParquetDataReader(str(tmp_path), 32, [100, 40])
    batches = list(reader)
    assert len(batches) == 3  # 100 rows -> 3 full batches of 32, tail dropped
    b = batches[0]
    assert b.dense_features.shape == (32, 2)
    assert (b.dense_features >= np.log(2.0) - 1e-6).all()  # log(x+2) transform
    vals = np.asarray(b.sparse_features.values).reshape(2, 32)
    assert (vals[0] < 100).all()
    assert (vals[1] >= 100).all() and (vals[1] < 140).all()
    # two-rank sharding partitions row groups
    r0 = list(ParquetDataReader(str(tmp_path), 16, [100, 40], rank=0, world_size=2))
    r1 = list(ParquetDataReader(str(tmp_path), 16, [100, 40], rank=1, world_size=2))
    assert len(r0) + len(r1) >= 4


def test_prefetch_iterator_preserves_order_and_errors():
    data = RandomRecDataset([50], 4, num_batches=5, dense_in_features=2)
    direct = [np.asarray(b.sparse_features.values) for b in data]
    prefetched = [
        np.asarray(b.sparse_features.values) for b in PrefetchIterator(data, depth=2)
    ]
    for a, b in zip(direct, prefetched):
        np.testing.assert_array_equal(a, b)

    def boom():
        yield data.make_batch(0)
        raise RuntimeError("upstream died")

    it = iter(PrefetchIterator(boom(), depth=1))
    next(it)
    with pytest.raises(RuntimeError, match="upstream died"):
        list(it)


def test_dispatch_sources():
    d = get_dataloader("random", "train", 4, table_sizes=[10, 20], num_batches=2)
    assert len(list(d)) == 2
    d = get_dataloader(
        "custom", "train", 4, table_sizes=[10, 20], num_batches=2, prefetch_depth=2
    )
    assert len(list(d)) == 2
    with pytest.raises(ValueError):
        get_dataloader("nope", "train", 4)
