"""HybridParallelDLRM facade: column-wise and tablewise topologies train
end-to-end on the 8-device virtual mesh with the real cache in the loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.models.hybrid import HybridParallelDLRM
from cachedembedding_tpu.parallel.mesh import make_mesh

needs_native = pytest.mark.skipif(
    not hostops.native_available(), reason="native hostops not built"
)


def _cfg(tables, use_tablewise=False):
    return DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=32,
        dense_in_features=4,
        dense_arch_layer_sizes=(16, 32),
        over_arch_layer_sizes=(16, 8, 1),
        batch_size=64,
        learning_rate=0.2,
        use_tablewise=use_tablewise,
        cache=CacheConfig(cache_ratio=0.5, warmup_ratio=0.5, buffer_size=0),
    )


def test_columnwise_hybrid_trains(cpu_devices):
    tables = [500, 300, 200, 100]
    cfg = _cfg(tables)
    mesh = make_mesh(8)
    data = SyntheticLongTailDataset(tables, cfg.batch_size, 6, dense_in_features=4, seed=2)
    model = HybridParallelDLRM(cfg, mesh, id_freq_map=data.id_freq_map())
    losses = []
    for b in data:
        slots = model.embed.prepare_ids(np.asarray(b.sparse_features.values))
        loss = model.train_step(
            np.asarray(b.dense_features), slots, np.asarray(b.labels), 0.2, 0.2
        )
        losses.append(float(np.asarray(loss.reshape(1))[0]))
    assert np.isfinite(losses).all()
    # hit rate accumulates
    assert model.embed.stats.hit_rate() > 0
    print(model.model_stats("hybrid"))


@needs_native
def test_tablewise_hybrid_trains(cpu_devices):
    tables = [300, 200, 150, 100]
    cfg = _cfg(tables, use_tablewise=True)
    mesh = make_mesh(4)
    data = SyntheticLongTailDataset(
        tables, cfg.batch_size, 5, dense_in_features=4, seed=3, global_ids=False
    )
    model = HybridParallelDLRM(
        cfg, mesh, id_freq_map=data.id_freq_map(), dataset="synthetic"
    )
    losses = []
    for b in data:
        ids_bf = np.asarray(b.sparse_features.to_fbp())[:, :, 0].T  # (B, F) per-table ids
        slot_ids, plans = model.embed.begin_prepare(ids_bf)
        model.embed.finish_prepare(plans)
        loss = model.train_step(
            np.asarray(b.dense_features), slot_ids, np.asarray(b.labels), 0.2, 0.2
        )
        losses.append(float(np.asarray(loss.reshape(1))[0]))
    assert np.isfinite(losses).all()
