"""Checkpoint/resume: training -> save -> fresh trainer -> load -> identical
eval outputs and continued training."""

import numpy as np
import pytest

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.config import CacheConfig, DLRMConfig
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer
from cachedembedding_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def _cfg(tables, **kw):
    return DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=16,
        dense_in_features=4,
        dense_arch_layer_sizes=(16, 16),
        over_arch_layer_sizes=(16, 8, 1),
        batch_size=128,
        learning_rate=0.3,
        # tiny capacities: pin the reference's unpipelined window depth
        # unless a test overrides (package default is 8)
        cache=CacheConfig(cache_ratio=0.4, warmup_ratio=0.7, buffer_size=0,
                          **{"prefetch_num": 1, **kw}),
    )


def test_save_load_roundtrip(tmp_path):
    tables = [400, 300]
    cfg = _cfg(tables)
    data = SyntheticLongTailDataset(tables, cfg.batch_size, 6, dense_in_features=4, seed=1)
    t1 = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    t1.train(data, num_iters=6)
    eval_data = SyntheticLongTailDataset(tables, cfg.batch_size, 2, dense_in_features=4, seed=9)
    m1 = t1.evaluate(eval_data)
    save_checkpoint(str(tmp_path / "ckpt"), t1)

    t2 = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    step = load_checkpoint(str(tmp_path / "ckpt"), t2)
    assert step == t1._step_idx
    m2 = t2.evaluate(eval_data)
    assert abs(m1["auroc"] - m2["auroc"]) < 1e-9
    assert abs(m1["accuracy"] - m2["accuracy"]) < 1e-9
    # training continues without error
    t2.train(data, num_iters=2)


@pytest.mark.skipif(not hostops.native_available(), reason="native hostops not built")
def test_save_load_virtual_table(tmp_path):
    tables = [500]
    cfg = _cfg(tables, weight_init="virtual")
    data = SyntheticLongTailDataset(tables, cfg.batch_size, 4, dense_in_features=4, seed=2)
    t1 = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    t1.train(data, num_iters=4)
    eval_data = SyntheticLongTailDataset(tables, cfg.batch_size, 2, dense_in_features=4, seed=8)
    m1 = t1.evaluate(eval_data)
    save_checkpoint(str(tmp_path / "ckpt"), t1)
    assert (tmp_path / "ckpt" / "overlay.npz").exists()

    t2 = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    load_checkpoint(str(tmp_path / "ckpt"), t2)
    m2 = t2.evaluate(eval_data)
    assert abs(m1["auroc"] - m2["auroc"]) < 1e-9
