"""Reference-format end-to-end fixture: a Criteo-Kaggle-format ``train.txt``
(tab-separated label + 13 ints + 26 hex cats, the format consumed by
/root/reference/scripts/preprocess/npy_preproc_criteo.py:24) goes through the
FULL offline chain — split_criteo_kaggle -> npy_preproc_criteo -> the flagship
CLI -> AUROC — on real file bytes, so a future real-data run is turnkey."""

import subprocess
import sys

import numpy as np
import pytest

NUM_ROWS = 1000
TABLES = [997, 499, 251]  # % hash sizes the CLI will apply


def write_reference_format_train_txt(path, rows=NUM_ROWS, seed=0):
    """Emit rows in the reference's raw Kaggle format: label \\t 13 int
    features (some empty — the format allows missing values) \\t 26 hex
    categorical ids (some empty)."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(rows):
            # a learnable signal: label correlates with the first int feature
            x0 = int(rng.integers(0, 100))
            label = int(rng.random() < (0.2 + 0.6 * (x0 > 50)))
            ints = [str(x0)] + [
                "" if rng.random() < 0.1 else str(int(rng.integers(-3, 1000)))
                for _ in range(12)
            ]
            cats = [
                "" if rng.random() < 0.05
                else format(int(rng.zipf(1.3)) % (1 << 32), "x")
                for _ in range(26)
            ]
            f.write("\t".join([str(label)] + ints + cats) + "\n")


def test_reference_format_chain(tmp_path, capsys):
    raw = tmp_path / "train.txt"
    write_reference_format_train_txt(raw)
    days_dir = tmp_path / "days"
    npy_dir = tmp_path / "npy"
    npy_dir.mkdir()

    # L6 step 1: split into 7 pseudo-days (reference split_criteo_kaggle.py)
    subprocess.run(
        [sys.executable, "scripts/preprocess/split_criteo_kaggle.py",
         "--input_file", str(raw), "--output_dir", str(days_dir)],
        check=True, cwd="/root/repo",
    )
    day_files = sorted(days_dir.iterdir())
    assert len(day_files) == 7
    total = sum(1 for p in day_files for _ in open(p))
    assert total == NUM_ROWS

    # L6 step 2: tsv -> npy (hex parse + log(x-min+2) dense transform)
    subprocess.run(
        [sys.executable, "scripts/preprocess/npy_preproc_criteo.py",
         "--input_dir", str(days_dir), "--output_dir", str(npy_dir),
         "--days", "7"],
        check=True, cwd="/root/repo",
    )
    dense0 = np.load(npy_dir / "day_0_dense.npy")
    sparse0 = np.load(npy_dir / "day_0_sparse.npy")
    assert dense0.shape[1] == 13 and dense0.dtype == np.float32
    assert sparse0.shape[1] == 26
    assert np.isfinite(dense0).all()  # log transform never sees x-min+2 <= 0

    # L2 + L4: the flagship CLI trains + evals AUROC on the npy days
    from cachedembedding_tpu.train.dlrm_main import main

    main([
        "--dataset_dir", str(npy_dir), "--kaggle",
        "--num_embeddings_per_feature", ",".join(map(str, (TABLES * 9)[:26])),
        "--batch_size", "16", "--embedding_dim", "16",
        "--dense_arch_layer_sizes", "32,16",
        "--over_arch_layer_sizes", "16,1",
        "--use_cache", "--cache_ratio", "0.3", "--use_freq",
        "--prefetch_num", "2",
        "--limit_val_batches", "3", "--limit_test_batches", "3",
        "--world_size", "1",
    ])
    out = capsys.readouterr().out
    assert "epoch 0 val: auroc=" in out
    assert "epoch 0 test: auroc=" in out
