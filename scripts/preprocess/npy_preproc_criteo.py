#!/usr/bin/env python
"""Criteo tsv -> npy preprocessing (parity with
/root/reference/scripts/preprocess/npy_preproc_criteo.py).

Per day file (tab-separated: label, 13 int features, 26 hex categorical):
  * dense:  int features -> float32 via log(x - min + 2)
    (reference transform, npy_preproc_criteo.py:58-59)
  * sparse: hex strings -> int32 (empty -> 0)
  * labels: int32 column

Usage: python npy_preproc_criteo.py --input_dir DIR --output_dir DIR [--days N]
Input files must be named day_{i}; outputs day_{i}_dense.npy / _sparse.npy /
_labels.npy. Use split_criteo_kaggle.py first to split Kaggle's single
train.txt into 7 pseudo-days.
"""

import argparse
import os

import numpy as np

INT_FEATURES = 13
CAT_FEATURES = 26


def convert_day(in_file: str, out_dir: str, day: int, chunk_rows: int = 2_000_000) -> None:
    dense_parts, sparse_parts, label_parts = [], [], []
    with open(in_file, "r") as f:
        done = False
        while not done:
            dense_rows, sparse_rows, label_rows = [], [], []
            for _ in range(chunk_rows):
                line = f.readline()
                if not line:
                    done = True
                    break
                cols = line.rstrip("\n").split("\t")
                label_rows.append(int(cols[0] or 0))
                dense_rows.append(
                    [int(c) if c else 0 for c in cols[1 : 1 + INT_FEATURES]]
                )
                sparse_rows.append(
                    [
                        int(c or "0", 16)
                        for c in cols[1 + INT_FEATURES : 1 + INT_FEATURES + CAT_FEATURES]
                    ]
                )
            if label_rows:
                dense_parts.append(np.asarray(dense_rows, np.int32))
                sparse_parts.append(np.asarray(sparse_rows, np.int64).astype(np.int32))
                label_parts.append(np.asarray(label_rows, np.int32))
    dense = np.concatenate(dense_parts)
    sparse = np.concatenate(sparse_parts)
    labels = np.concatenate(label_parts).reshape(-1, 1)
    # log(x - min + 2) dense transform (reference :58-59)
    dense = np.log((dense - (dense.min() - 2)).astype(np.float32), dtype=np.float32)
    np.save(os.path.join(out_dir, f"day_{day}_dense.npy"), dense)
    np.save(os.path.join(out_dir, f"day_{day}_sparse.npy"), sparse)
    np.save(os.path.join(out_dir, f"day_{day}_labels.npy"), labels)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--days", type=int, default=7)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    for day in range(args.days):
        in_file = os.path.join(args.input_dir, f"day_{day}")
        if not os.path.exists(in_file):
            print(f"skip missing {in_file}")
            continue
        print(f"converting day {day}...")
        convert_day(in_file, args.output_dir, day)


if __name__ == "__main__":
    main()
