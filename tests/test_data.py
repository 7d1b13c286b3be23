"""Data layer tests: npy pipeline sharding/offset semantics, preprocessing CLI
round-trip, frequency counter, and split semantics."""

import os
import subprocess
import sys

import numpy as np
import pytest

from cachedembedding_tpu.data.feature_counter import GlobalFeatureCounter, get_id_freq_map
from cachedembedding_tpu.data.npy_dataset import (
    InMemoryNpyDataset,
    rank_row_ranges,
    stage_files,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_day(tmp, day, n_rows, n_dense=3, tables=(10, 20, 5), seed=0):
    rng = np.random.default_rng(seed + day)
    dense = rng.random((n_rows, n_dense)).astype(np.float32)
    sparse = np.stack(
        [rng.integers(0, 1 << 30, n_rows) for _ in tables], axis=1
    ).astype(np.int32)
    labels = rng.integers(0, 2, (n_rows, 1)).astype(np.int32)
    np.save(tmp / f"day_{day}_dense.npy", dense)
    np.save(tmp / f"day_{day}_sparse.npy", sparse)
    np.save(tmp / f"day_{day}_labels.npy", labels)
    return dense, sparse, labels


class TestRowRanges:
    def test_even_split(self):
        r = [rank_row_ranges([10, 10], rank, 2) for rank in range(2)]
        assert r[0] == {0: (0, 10)}
        assert r[1] == {1: (0, 10)}

    def test_remainder_to_first_ranks(self):
        r = [rank_row_ranges([10], rank, 3) for rank in range(3)]
        sizes = [sum(hi - lo for lo, hi in d.values()) for d in r]
        assert sizes == [4, 3, 3]
        # coverage is exact and disjoint
        rows = []
        for d in r:
            for lo, hi in d.values():
                rows += list(range(lo, hi))
        assert sorted(rows) == list(range(10))

    def test_cross_file_chunk(self):
        d = rank_row_ranges([4, 4], 0, 1)
        assert d == {0: (0, 4), 1: (0, 4)}


class TestNpyDataset:
    def test_hash_and_global_offsets(self, tmp_path):
        tables = (10, 20, 5)
        _, sparse, _ = write_day(tmp_path, 0, 8, tables=tables)
        ds = InMemoryNpyDataset(
            [str(tmp_path / "day_0_dense.npy")],
            [str(tmp_path / "day_0_sparse.npy")],
            [str(tmp_path / "day_0_labels.npy")],
            batch_size=4,
            hashes=tables,
        )
        b = next(iter(ds))
        vals = np.asarray(b.sparse_features.values).reshape(3, 4)  # (F, B)
        expect = sparse[:4].astype(np.int64) % np.asarray(tables)
        expect += np.asarray([0, 10, 30])  # cumsum offsets
        np.testing.assert_array_equal(vals.T, expect)

    def test_rank_sharding_covers_all_rows(self, tmp_path):
        tables = (10, 20, 5)
        write_day(tmp_path, 0, 16, tables=tables)
        seen = []
        for rank in range(2):
            ds = InMemoryNpyDataset(
                [str(tmp_path / "day_0_dense.npy")],
                [str(tmp_path / "day_0_sparse.npy")],
                [str(tmp_path / "day_0_labels.npy")],
                batch_size=4,
                rank=rank,
                world_size=2,
                hashes=tables,
            )
            assert len(ds) == 2
            for b in ds:
                seen.append(np.asarray(b.dense_features))
        assert np.concatenate(seen).shape[0] == 16

    def test_assigned_tables_filtering(self, tmp_path):
        tables = (10, 20, 5)
        _, sparse, _ = write_day(tmp_path, 0, 8, tables=tables)
        ds = InMemoryNpyDataset(
            [str(tmp_path / "day_0_dense.npy")],
            [str(tmp_path / "day_0_sparse.npy")],
            [str(tmp_path / "day_0_labels.npy")],
            batch_size=8,
            hashes=tables,
            assigned_tables=[2],  # only the third table
        )
        b = next(iter(ds))
        assert b.sparse_features.num_features == 1
        expect = sparse[:, 2].astype(np.int64) % 5 + 30
        np.testing.assert_array_equal(np.asarray(b.sparse_features.values), expect)

    def test_stage_split_semantics(self, tmp_path):
        for day in range(3):
            write_day(tmp_path, day, 8)
        dense, sparse, labels, er, wm = stage_files(str(tmp_path), "train", final_day=2)
        assert len(dense) == 2 and all("day_2" not in p for p in dense)
        assert (er, wm) == (0, 1)
        _, _, _, er_v, wm_v = stage_files(str(tmp_path), "val", final_day=2)
        assert (er_v, wm_v) == (0, 2)
        _, _, _, er_t, wm_t = stage_files(str(tmp_path), "test", final_day=2)
        assert (er_t, wm_t) == (1, 2)


class TestFreqCounter:
    def test_counts_match_manual(self, tmp_path):
        tables = (4, 6)
        rng = np.random.default_rng(0)
        sparse = rng.integers(0, 100, (50, 2)).astype(np.int32)
        np.save(tmp_path / "x_sparse.npy", sparse)
        freq = GlobalFeatureCounter([str(tmp_path / "x_sparse.npy")], tables).compute()
        manual = np.zeros(10, np.int64)
        for r in sparse:
            manual[r[0] % 4] += 1
            manual[4 + r[1] % 6] += 1
        np.testing.assert_array_equal(freq, manual)

    def test_disk_cache_roundtrip(self, tmp_path):
        tables = (4, 6)
        sparse = np.arange(20).reshape(10, 2).astype(np.int32)
        np.save(tmp_path / "a_sparse.npy", sparse)
        f1 = get_id_freq_map(str(tmp_path), tables)
        assert os.path.exists(tmp_path / "id_freq_map.npy")
        f2 = get_id_freq_map(str(tmp_path), tables)  # from cache
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


class TestPreprocCLI:
    def test_criteo_tsv_roundtrip(self, tmp_path):
        # two tiny tsv "days"
        rows = [
            "1\t" + "\t".join(str(i) for i in range(13)) + "\t" + "\t".join(["a1f"] * 26),
            "0\t" + "\t".join([""] * 13) + "\t" + "\t".join([""] * 26),
        ]
        (tmp_path / "in").mkdir()
        (tmp_path / "out").mkdir()
        for day in range(2):
            (tmp_path / "in" / f"day_{day}").write_text("\n".join(rows) + "\n")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/preprocess/npy_preproc_criteo.py"),
             "--input_dir", str(tmp_path / "in"), "--output_dir", str(tmp_path / "out"),
             "--days", "2"],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        dense = np.load(tmp_path / "out" / "day_0_dense.npy")
        sparse = np.load(tmp_path / "out" / "day_0_sparse.npy")
        labels = np.load(tmp_path / "out" / "day_0_labels.npy")
        assert dense.shape == (2, 13) and sparse.shape == (2, 26) and labels.shape == (2, 1)
        assert sparse[0, 0] == int("a1f", 16)
        assert sparse[1, 0] == 0  # empty -> 0
        # log(x - min + 2): row1 dense all 0 (min) -> log(2)
        np.testing.assert_allclose(dense[1], np.log(2.0), rtol=1e-6)
