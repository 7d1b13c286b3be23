"""Full-CLI integration on an on-disk npy dataset: generate a tiny
kaggle-format dataset (day_N_{dense,sparse,labels}.npy), then run the
flagship CLI end to end (train + mid-epoch val + final val/test + freq map
caching) — the closest runnable analog of the reference's metric-based E2E
validation (SURVEY.md §4)."""

import numpy as np
import pytest


TABLES = [50, 200, 30]


def write_dataset(tmp, days=3, rows=64, seed=0):
    rng = np.random.default_rng(seed)
    for day in range(days):
        dense = rng.random((rows, 13)).astype(np.float32)
        sparse = np.stack(
            [rng.integers(0, 10_000, rows) for _ in TABLES], axis=1
        ).astype(np.int64)
        labels = rng.integers(0, 2, rows).astype(np.int32)
        np.save(tmp / f"day_{day}_dense.npy", dense)
        np.save(tmp / f"day_{day}_sparse.npy", sparse)
        np.save(tmp / f"day_{day}_labels.npy", labels)


def test_flagship_cli_on_files(tmp_path, capsys):
    write_dataset(tmp_path)
    from cachedembedding_tpu.train.dlrm_main import main

    main([
        "--dataset_dir", str(tmp_path), "--kaggle",
        "--num_embeddings_per_feature", ",".join(map(str, TABLES)),
        "--batch_size", "16",
        "--embedding_dim", "16",
        "--dense_arch_layer_sizes", "32,16",
        "--over_arch_layer_sizes", "16,1",
        "--use_cache", "--cache_ratio", "0.5", "--use_freq",
        "--prefetch_num", "2",
        "--limit_val_batches", "2", "--limit_test_batches", "2",
        "--world_size", "1",
    ])
    out = capsys.readouterr().out
    assert "epoch 0 val: auroc=" in out
    assert "epoch 0 test: auroc=" in out
    # the id-frequency map is cached to disk (reference id_freq_map.pt analog,
    # /root/reference/recsys/datasets/criteo.py:483-485)
    assert any("id_freq_map" in p.name for p in tmp_path.iterdir())


def test_baseline_cli_on_files(tmp_path, capsys):
    write_dataset(tmp_path)
    from cachedembedding_tpu.baselines.dlrm_main import main

    main([
        "--dataset_dir", str(tmp_path),
        "--num_embeddings_per_feature", ",".join(map(str, TABLES)),
        "--batch_size", "16", "--embedding_dim", "16",
        "--kernel", "hbm",
        "--limit_train_batches", "6", "--limit_val_batches", "2",
    ])
    out = capsys.readouterr().out
    assert "val: auroc=" in out
    assert "EmbeddingShardingPlan" in out
